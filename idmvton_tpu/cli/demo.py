"""Interactive try-on demo server (reference: gradio_demo/app.py).

A dependency-free HTTP server (stdlib http.server) with an HTML upload form —
the TPU-image equivalent of the reference's Gradio UI. Implements the
start_tryon flow (app.py:126-234): optional 3:4 auto-crop, auto-masking via
OpenPose + SCHP -> get_mask_location, DensePose conditioning, fixed prompt
templates, CFG 2.0 at 768x1024.

Usage:
  python -m idmvton_tpu.cli.demo [--port 7860] [--tiny] [--pretrained DIR]
"""

from __future__ import annotations

import argparse
import base64
import html
import io
import json
import threading
import urllib.parse

import numpy as np
from PIL import Image

_PAGE = """<!doctype html>
<html><head><title>idmvton_tpu try-on</title></head>
<body style="font-family: sans-serif; max-width: 640px; margin: 2em auto;">
<h2>idmvton_tpu — virtual try-on</h2>
<form method="post" action="/tryon" enctype="multipart/form-data">
  <p>Person photo: <input type="file" name="person" id="person" required></p>
  <p>Garment photo: <input type="file" name="garment" id="garment" required></p>
  <p>Mask (white = repaint; used when auto mask is off — the reference's
     hand-drawn mask layer, app.py:156):
     <input type="file" name="mask"></p>
  <p>…or draw it (the reference's ImageEditor brush layer, app.py:244-247;
     takes precedence over an uploaded mask file):</p>
  <p><canvas id="maskcanvas" width="0" height="0"
      style="border:1px solid #999;touch-action:none;cursor:crosshair">
     </canvas></p>
  <p>brush <input type="range" id="brush" min="4" max="80" value="28">
     <button type="button" onclick="clearMask()">clear drawn mask</button></p>
  <input type="hidden" name="mask_data" id="mask_data">
  <p>Garment description: <input type="text" name="desc" value="shirt"></p>
  <p><label><input type="checkbox" name="auto_mask" checked> auto mask</label>
     <label><input type="checkbox" name="auto_crop"> auto crop 3:4</label></p>
  <p>Steps: <input type="number" name="steps" value="30" min="20" max="40">
     Seed: <input type="number" name="seed" value="42"></p>
  <p>Output: <select name="format"><option>html</option><option>json</option>
     <option>png</option></select></p>
  <p><input type="submit" value="Try on"></p>
</form>
{galleries}
<script>
async function pick(kind, enc) {{
  // enc is the percent-encoded filename straight from the thumb URL
  const r = await fetch('/example/' + kind + '/' + enc);
  const blob = await r.blob();
  const dt = new DataTransfer();
  dt.items.add(new File([blob], decodeURIComponent(enc),
                        {{type: blob.type}}));
  document.getElementById(kind === 'human' ? 'person' : 'garment')
          .files = dt.files;
  if (kind === 'human') loadCanvas(blob);
}}

// --- drawable mask layer (reference gradio ImageEditor, app.py:244-247:
// brush strokes over the person image; any non-black pixel of the layer
// becomes mask via pil_to_binary_mask, app.py:31-42) ---------------------
const cv = document.getElementById('maskcanvas'), cx = cv.getContext('2d');
let img = null, strokes = null, sx = null, drawing = false, drawn = false;

function loadCanvas(blob) {{
  img = new Image();
  img.onload = () => {{
    const w = 384, h = Math.round(w * img.height / img.width);
    cv.width = w; cv.height = h;
    strokes = document.createElement('canvas');   // mask-only layer
    strokes.width = w; strokes.height = h;
    sx = strokes.getContext('2d');
    sx.fillStyle = 'black'; sx.fillRect(0, 0, w, h);
    drawn = false; redraw();
  }};
  img.src = URL.createObjectURL(blob);
}}
function redraw() {{
  cx.drawImage(img, 0, 0, cv.width, cv.height);
  cx.globalAlpha = 0.55; cx.drawImage(strokes, 0, 0); cx.globalAlpha = 1;
}}
function dab(e) {{
  const r = cv.getBoundingClientRect();
  const x = (e.clientX - r.left) * cv.width / r.width;
  const y = (e.clientY - r.top) * cv.height / r.height;
  sx.fillStyle = 'white'; sx.beginPath();
  sx.arc(x, y, +document.getElementById('brush').value / 2, 0, 7);
  sx.fill(); drawn = true; redraw();
}}
cv.addEventListener('pointerdown', e => {{
  if (!img) return; drawing = true; cv.setPointerCapture(e.pointerId);
  dab(e);
}});
cv.addEventListener('pointermove', e => {{ if (drawing) dab(e); }});
cv.addEventListener('pointerup', () => {{ drawing = false; }});
function clearMask() {{
  if (!sx) return;
  sx.fillStyle = 'black'; sx.fillRect(0, 0, cv.width, cv.height);
  drawn = false; redraw();
}}
document.getElementById('person').addEventListener('change', e => {{
  if (e.target.files[0]) loadCanvas(e.target.files[0]);
}});
document.querySelector('form').addEventListener('submit', () => {{
  document.getElementById('mask_data').value =
      drawn ? strokes.toDataURL('image/png') : '';
}});
</script>
</body></html>"""

_GALLERY = """<h3>example {title}</h3><p>
{thumbs}
</p>"""

# {enc} = urllib.parse.quote(name, safe="") — quoting covers spaces/%/#/
# non-ASCII in the URL and leaves only [A-Za-z0-9_.~%-], which is also safe
# inside the single-quoted onclick JS string
_THUMB = ('<img src="/example/{kind}/{enc}" width="72" '
          'style="cursor:pointer;margin:2px" title="{title}" '
          'onclick="pick(\'{kind}\', \'{enc}\')">')

_RESULT_PAGE = """<!doctype html>
<html><head><title>idmvton_tpu try-on result</title></head>
<body style="font-family: sans-serif; max-width: 960px; margin: 2em auto;">
<h2>result</h2><img src="data:image/png;base64,{result}" width="384">
<h2>masked preview</h2><img src="data:image/png;base64,{masked}" width="384">
<p><a href="/">back</a></p></body></html>"""


class TryonService:
    """Holds the models + jitted programs; thread-safe single-flight."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp
        from idmvton_tpu.core.config import SchedulerConfig
        from idmvton_tpu.diffusion.scheduler import DDPMScheduler
        from idmvton_tpu.pipeline.tryon import TryonModels, TryonPipeline
        from idmvton_tpu.data.tokenizer import load_tokenizers
        from idmvton_tpu.preprocess.openpose import OpenPose
        from idmvton_tpu.preprocess.schp import Parsing
        from idmvton_tpu.preprocess.densepose.visualize import DensePose

        self.jnp = jnp
        self.jax = jax
        self.args = args
        self.dtype = jnp.bfloat16 if not args.tiny else jnp.float32
        self.size = (args.width, args.height)
        if args.pretrained:
            from idmvton_tpu.weights.checkpoint import load_pipeline
            self.models = load_pipeline(args.pretrained, self.dtype)
        else:
            self.models = TryonModels.init(jax.random.PRNGKey(0),
                                           tiny=args.tiny, dtype=self.dtype)
        self.pipe = TryonPipeline(self.models,
                                  DDPMScheduler(SchedulerConfig.sdxl_inference()))
        self.tok1, self.tok2 = load_tokenizers(args.tokenizer_dir,
                                               args.tokenizer_dir)
        self.openpose = OpenPose()
        self.parsing = Parsing()
        if args.tiny:
            # tiny serving mode: same DensePose code path (resize, BGR mean,
            # R-CNN, painting) at toy capacity — the full-size config runs the
            # R-50-FPN at short-edge 800 (~53 s/call on a CPU test host),
            # which is preprocessing-parity territory covered by
            # tests/test_densepose*.py, not demo-flow territory
            from idmvton_tpu.preprocess.densepose.rcnn import DensePoseConfig
            self.densepose = DensePose(
                cfg=DensePoseConfig(rpn_pre_nms_topk=50, rpn_post_nms_topk=20,
                                    num_detections=4, dp_chunk=2),
                short_edge=64, max_size=96)
        else:
            self.densepose = DensePose()
        self.lock = threading.Lock()
        self._gens = {}
        self.examples = self._discover_examples(
            getattr(args, "examples_dir", None))

    @staticmethod
    def _discover_examples(root) -> dict:
        """Example galleries (reference app.py:240-310 builds them from
        gradio_demo/example/{human,cloth}). Expects <root>/human and
        <root>/cloth (or garment/) image dirs; empty dict when absent."""
        import os
        out = {}
        if not root:
            return out
        for kind, names in (("human", ("human",)),
                            ("cloth", ("cloth", "garment"))):
            for n in names:
                d = os.path.join(root, n)
                if os.path.isdir(d):
                    files = sorted(
                        f for f in os.listdir(d)
                        if f.lower().endswith((".jpg", ".jpeg", ".png")))
                    if files:
                        out[kind] = (d, files)
                        break  # an empty cloth/ still falls through to
                               # garment/ — only a populated dir settles it
        return out

    def _gen(self, steps: int):
        if steps not in self._gens:
            # the fused whole-pipeline program takes tens of minutes to
            # remote-compile on the TPU tunnel; serve with the stepwise path
            # there (identical math, small programs) like cli/train.py:160
            make = (self.pipe.stepwise_generate
                    if self.jax.default_backend() == "tpu"
                    else self.pipe.jit_generate)
            self._gens[steps] = make(num_steps=steps, guidance_scale=2.0)
        return self._gens[steps]

    @staticmethod
    def auto_crop_3_4(img: Image.Image):
        """3:4 center crop of BOTH dims (reference: app.py:136-145).
        Returns (crop, box)."""
        w, h = img.size
        target_w = int(min(w, h * 3 / 4))
        target_h = int(min(h, w * 4 / 3))
        left = (w - target_w) // 2
        top = (h - target_h) // 2
        box = (left, top, left + target_w, top + target_h)
        return img.crop(box), box

    def tryon(self, person: Image.Image, garment: Image.Image, desc: str,
              *, auto_mask: bool = True, auto_crop: bool = False,
              mask_image: Image.Image = None, steps: int = 30,
              seed: int = 42) -> Image.Image:
        jnp, jax = self.jnp, self.jax
        from idmvton_tpu.data.image import (
            normalize_pm1, clip_preprocess, load_mask, denormalize_to_uint8,
        )
        from idmvton_tpu.preprocess.agnostic_mask import get_mask_location

        person = person.convert("RGB")
        garment = garment.convert("RGB")
        crop_box = None
        original = person
        if auto_crop:
            person, crop_box = self.auto_crop_3_4(person)
        w, h = self.size
        person_resized = person.resize((w, h))

        if auto_mask or mask_image is None:
            small = np.asarray(person.resize((384, 512)))
            keypoints = self.openpose(small)
            parse, _ = self.parsing(small)
            mask_pil, _ = get_mask_location("hd", "upper_body", parse,
                                            keypoints)
            mask = load_mask(mask_pil, (w, h))
        else:
            # hand-drawn layer: any non-black pixel is mask
            # (pil_to_binary_mask, app.py:31-42 threshold 0)
            gray = np.asarray(mask_image.convert("RGB").resize((w, h))
                              .convert("L"))
            mask = (gray > 0).astype(np.float32)[..., None]

        # masked-gray preview (app.py:159-161: (1 - mask) * normalized person,
        # displayed as (x+1)/2) — returned alongside the result (app.py:239-241)
        person_pm1 = normalize_pm1(person, (w, h))
        mask_gray = Image.fromarray(
            denormalize_to_uint8(((1.0 - mask) * person_pm1)[None])[0])

        pose_rgb = self.densepose(np.asarray(person_resized))
        dtype = self.dtype
        caption = "model is wearing " + desc
        caption_cloth = "a photo of " + desc
        negative = "monochrome, lowres, bad anatomy, worst quality, low quality"
        isz = self.models.vision_cfg.image_size
        ip = clip_preprocess(garment)
        if ip.shape[0] != isz:
            ip = np.asarray(jax.image.resize(jnp.asarray(ip), (isz, isz, 3),
                                             "bilinear"))
        inputs = dict(
            person=jnp.asarray(person_pm1[None], dtype),
            mask=jnp.asarray(mask[None], dtype),
            pose=jnp.asarray((pose_rgb.astype(np.float32) / 127.5 - 1)[None],
                             dtype),
            cloth=jnp.asarray(normalize_pm1(garment, (w, h))[None], dtype),
            ip_pixels=jnp.asarray(ip[None], dtype),
            prompt_ids_l=jnp.asarray(self.tok1([caption])),
            prompt_ids_g=jnp.asarray(self.tok2([caption])),
            neg_ids_l=jnp.asarray(self.tok1([negative])),
            neg_ids_g=jnp.asarray(self.tok2([negative])),
            cloth_ids_l=jnp.asarray(self.tok1([caption_cloth])),
            cloth_ids_g=jnp.asarray(self.tok2([caption_cloth])),
        )
        with self.lock:
            images = self._gen(steps)(self.models.params(),
                                      jax.random.PRNGKey(seed), **inputs)
        out = Image.fromarray(denormalize_to_uint8(np.asarray(images))[0])
        if crop_box is not None:
            out = out.resize((crop_box[2] - crop_box[0],
                              crop_box[3] - crop_box[1]))
            full = original.copy()
            full.paste(out, (crop_box[0], crop_box[1]))
            return full, mask_gray
        return out, mask_gray


def make_handler(service: TryonService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/example/"):
                return self._serve_example()
            galleries = "".join(
                _GALLERY.format(
                    title="people" if kind == "human" else "garments",
                    thumbs="".join(
                        _THUMB.format(kind=kind,
                                      enc=urllib.parse.quote(n, safe=""),
                                      title=html.escape(n, quote=True))
                        for n in files))
                for kind, (_, files) in service.examples.items())
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE.format(galleries=galleries).encode())

        def _serve_example(self):
            import os
            parts = self.path.split("/")  # ['', 'example', kind, enc-name]
            if len(parts) != 4 or parts[2] not in service.examples:
                self.send_response(404)
                self.end_headers()
                return
            d, files = service.examples[parts[2]]
            # browsers request the percent-encoded thumb URL; decode before
            # matching against the on-disk names
            name = os.path.basename(urllib.parse.unquote(parts[3]))
            if name not in files:  # also rejects any path traversal
                self.send_response(404)
                self.end_headers()
                return
            with open(os.path.join(d, name), "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", "image/png"
                             if name.lower().endswith(".png") else "image/jpeg")
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            import cgi  # noqa: F401 — stdlib multipart parsing below
            from email.parser import BytesParser
            from email.policy import default as email_default
            length = int(self.headers["Content-Length"])
            ctype = self.headers["Content-Type"]
            body = (b"Content-Type: " + ctype.encode() + b"\r\n\r\n"
                    + self.rfile.read(length))
            msg = BytesParser(policy=email_default).parsebytes(body)
            fields = {}
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                payload = part.get_payload(decode=True)
                fields[name] = payload
            try:
                person = Image.open(io.BytesIO(fields["person"]))
                garment = Image.open(io.BytesIO(fields["garment"]))
                mask_image = (Image.open(io.BytesIO(fields["mask"]))
                              if fields.get("mask") else None)
                # canvas-drawn layer (data:image/png;base64,...) takes
                # precedence over an uploaded mask file, like the reference
                # editor layer over the base image (app.py:156)
                md = (fields.get("mask_data") or b"").decode().strip()
                if md.startswith("data:image/"):
                    mask_image = Image.open(io.BytesIO(
                        base64.b64decode(md.split(",", 1)[1])))
                desc = (fields.get("desc") or b"shirt").decode()
                fmt = (fields.get("format") or b"html").decode()
                out, mask_gray = service.tryon(
                    person, garment, desc,
                    auto_mask="auto_mask" in fields,
                    auto_crop="auto_crop" in fields,
                    mask_image=mask_image,
                    steps=int(fields.get("steps", b"30")),
                    seed=int(fields.get("seed", b"42")))

                def png(im):
                    buf = io.BytesIO()
                    im.save(buf, "PNG")
                    return buf.getvalue()

                self.send_response(200)
                if fmt == "png":
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(png(out))
                elif fmt == "json":
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({
                        "result": base64.b64encode(png(out)).decode(),
                        "masked": base64.b64encode(png(mask_gray)).decode(),
                    }).encode())
                else:  # result + masked-gray preview (app.py:239-241)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_RESULT_PAGE.format(
                        result=base64.b64encode(png(out)).decode(),
                        masked=base64.b64encode(png(mask_gray)).decode(),
                    ).encode())
            except Exception as e:  # surface errors to the browser
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--examples_dir", default=None,
                   help="dir with human/ and cloth/ example images shown as "
                        "clickable galleries (reference app.py:240-310)")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    service = TryonService(args)
    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(service))
    print(f"serving on http://0.0.0.0:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
