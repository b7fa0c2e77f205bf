"""Demo service end-to-end (tiny models): direct service calls plus the
HTTP layer with the manual-mask branch (reference: gradio_demo/app.py:156
hand-drawn mask layer, :239-241 result + masked-gray preview)."""

import argparse
import base64
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image

from idmvton_tpu.cli.demo import TryonService, make_handler


def _args(**kw):
    d = dict(width=48, height=64, pretrained=None, tokenizer_dir=None,
             tiny=True)
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture(scope="module")
def svc():
    """ONE shared TryonService for the whole module: construction + the
    steps=2 pipeline compile dominate each test's wall time (~100 s each on
    this host); the HTTP/branch logic under test is stateless apart from the
    _gens compile cache, which sharing exercises too."""
    return TryonService(_args())


def _imgs(seed=0, size=(96, 128)):
    rng = np.random.RandomState(seed)
    w, h = size
    person = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
    garment = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
    return person, garment


def test_tryon_service_end_to_end(svc):
    person, garment = _imgs()
    out, mask_gray = svc.tryon(person, garment, "shirt", auto_mask=True,
                               steps=2)
    assert out.size == (48, 64)
    assert mask_gray.size == (48, 64)


def test_tryon_manual_mask_branch(svc):
    person, garment = _imgs(1)
    # hand-drawn layer: white blob on black (pil_to_binary_mask threshold 0)
    layer = np.zeros((128, 96, 3), np.uint8)
    layer[30:80, 20:70] = 255
    out, mask_gray = svc.tryon(person, garment, "shirt", auto_mask=False,
                               mask_image=Image.fromarray(layer), steps=2)
    assert out.size == (48, 64)
    # preview is the person outside the mask, mid-gray inside
    mg = np.asarray(mask_gray)
    assert mg.shape == (64, 48, 3)
    inside = mg[20:38, 12:32]
    assert np.abs(inside.astype(int) - 127).max() <= 1, "mask region ~0.5 gray"


def test_auto_crop_3_4():
    img = Image.new("RGB", (1000, 1000))
    crop, box = TryonService.auto_crop_3_4(img)
    assert crop.size == (750, 1000)
    assert box == (125, 0, 875, 1000)
    # wide image: height is cropped too (app.py:136-145)
    wide = Image.new("RGB", (2000, 1000))
    crop, box = TryonService.auto_crop_3_4(wide)
    assert crop.size == (750, 1000)


def test_http_manual_mask_end_to_end(svc):
    """Full HTTP round trip through the stdlib server: multipart POST with
    both a mask FILE and a canvas-drawn mask_data layer (the browser canvas,
    reference app.py:244-247); the drawn layer must take precedence. JSON
    response carries result + masked preview."""
    from http.server import ThreadingHTTPServer
    import urllib.request

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        person, garment = _imgs(2)

        def png_bytes(im):
            buf = io.BytesIO()
            im.save(buf, "PNG")
            return buf.getvalue()

        layer = np.zeros((128, 96, 3), np.uint8)
        layer[40:90, 24:72] = 255
        # decoy mask FILE covering everything: if the server preferred the
        # file over the drawn layer, the whole preview would read mid-gray
        decoy = np.full((128, 96, 3), 255, np.uint8)
        mask_data = (b"data:image/png;base64,"
                     + base64.b64encode(png_bytes(Image.fromarray(layer))))
        boundary = "XBOUNDARYX"
        parts = []
        for name, payload, is_file in (
                ("person", png_bytes(person), True),
                ("garment", png_bytes(garment), True),
                ("mask", png_bytes(Image.fromarray(decoy)), True),
                ("mask_data", mask_data, False),
                ("desc", b"shirt", False),
                ("steps", b"2", False),
                ("seed", b"7", False),
                ("format", b"json", False)):
            head = (f'--{boundary}\r\nContent-Disposition: form-data; '
                    f'name="{name}"'
                    + (f'; filename="{name}.png"\r\nContent-Type: image/png'
                       if is_file else "")
                    + "\r\n\r\n").encode()
            parts.append(head + payload + b"\r\n")
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tryon", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        result = Image.open(io.BytesIO(base64.b64decode(payload["result"])))
        masked = Image.open(io.BytesIO(base64.b64decode(payload["masked"])))
        assert result.size == (48, 64)
        assert masked.size == (48, 64)
        # the drawn mask region reads back as the mid-gray preview
        mg = np.asarray(masked)
        assert np.abs(mg[25:40, 15:30].astype(int) - 127).max() <= 1
        # outside the drawn layer the person shows through — proves the
        # all-white decoy mask FILE did not win over mask_data (a random
        # person image is never uniformly mid-gray)
        outside = mg[:8, :8].astype(int)
        assert np.abs(outside - 127).max() > 1
    finally:
        server.shutdown()


def test_examples_galleries(tmp_path, svc):
    """Example galleries (reference app.py:240-310): the index page lists
    clickable thumbs and /example/<kind>/<name> serves the image; path
    traversal and unknown names 404."""
    from http.server import ThreadingHTTPServer
    import urllib.request
    import urllib.error

    for kind, name in (("human", "p1.jpg"), ("cloth", "g1.png"),
                       ("cloth", "blue shirt.png")):
        d = tmp_path / kind
        d.mkdir(exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / name)
    # discovery logic under test; graft onto the shared service (restored
    # below) instead of paying a second full model build
    discovered = TryonService._discover_examples(str(tmp_path))
    assert set(discovered) == {"human", "cloth"}

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    old_examples = svc.examples
    try:
        svc.examples = discovered
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                    timeout=60) as resp:
            page = resp.read().decode()
        assert "/example/human/p1.jpg" in page
        assert "/example/cloth/g1.png" in page
        # names with spaces render percent-encoded (raw would 404 in the
        # browser) and serve through the encoded URL
        assert "/example/cloth/blue%20shirt.png" in page
        assert "blue shirt.png" not in page.split("<script>")[0].replace(
            'title="blue shirt.png"', "")
        for url in ("/example/cloth/g1.png",
                    "/example/cloth/blue%20shirt.png"):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{url}",
                                        timeout=60) as resp:
                assert resp.status == 200
                assert Image.open(io.BytesIO(resp.read())).size == (8, 8)
        for bad in ("/example/cloth/nope.png", "/example/x/y",
                    "/example/cloth/..%2F..%2Fetc%2Fpasswd"):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}{bad}",
                                       timeout=60)
                raise AssertionError(f"{bad} did not 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
    finally:
        svc.examples = old_examples
        server.shutdown()


def test_discover_examples_garment_fallback(tmp_path):
    """An existing-but-imageless cloth/ must fall through to garment/
    (the documented alternative dir name), not settle the search."""
    (tmp_path / "cloth").mkdir()          # empty
    g = tmp_path / "garment"
    g.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(g / "x.jpg")
    out = TryonService._discover_examples(str(tmp_path))
    assert out["cloth"] == (str(g), ["x.jpg"])


def test_index_page_without_examples(svc):
    assert svc.examples == {}
    from http.server import ThreadingHTTPServer
    import urllib.request
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                    timeout=60) as resp:
            page = resp.read().decode()
        assert "virtual try-on" in page
        assert "example" not in page.split("<script>")[0].split("</form>")[1]
    finally:
        server.shutdown()
