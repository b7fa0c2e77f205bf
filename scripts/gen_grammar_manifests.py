"""Generate diffusers-format key manifests for the SDXL UNet / VAE from the
NAMING GRAMMAR, as an independent transcription.

diffusers is not installed in this environment and the yisol/IDM-VTON hub
weights are not present, so these manifests cannot be captured from a live
state dict like the torch-vendored ones (scripts/dump_key_manifests.py).
Instead this script transcribes the diffusers module-naming grammar directly
from the reference's vendored model code:

- UNet2DConditionModel: src/unet_hacked_tryon.py (module tree construction,
  get_down_block/get_up_block; up-block skip-channel arithmetic from
  diffusers UpBlock2D: res_skip = in_ch if j==last else out_ch,
  resnet_in = prev_out if j==0 else out_ch)
- IP attention processors: ip_adapter/attention_processor.py IPAttnProcessor2_0
  (to_k_ip/to_v_ip live under ...attn2.processor. in the trained tryon UNet)
- AutoencoderKL: standard diffusers SDXL VAE (128,256,512,512 channels)

Because weights/converter.py encodes the same grammar, this is a SECOND,
separately-written transcription — agreement is the cross-check
(tests/test_key_manifests.py). Writes tests/fixtures/manifests/*.json.
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "manifests")


class M(dict):
    def lin(self, key, o, i, bias=True):
        self[key + ".weight"] = [o, i]
        if bias:
            self[key + ".bias"] = [o]

    def conv(self, key, o, i, k=3):
        self[key + ".weight"] = [o, i, k, k]
        self[key + ".bias"] = [o]

    def norm(self, key, c):
        self[key + ".weight"] = [c]
        self[key + ".bias"] = [c]


def unet_manifest(in_ch: int, ip: bool) -> dict:
    C = [320, 640, 1280]
    TDEPTH = [0, 2, 10]
    CTX = 2048
    TEMB = 1280
    m = M()

    def resnet(pre, cin, cout, shortcut=None):
        m.norm(pre + ".norm1", cin)
        m.conv(pre + ".conv1", cout, cin)
        m.lin(pre + ".time_emb_proj", cout, TEMB)
        m.norm(pre + ".norm2", cout)
        m.conv(pre + ".conv2", cout, cout)
        if shortcut if shortcut is not None else (cin != cout):
            m.conv(pre + ".conv_shortcut", cout, cin, k=1)

    def tblock(pre, inner):
        for n in ("norm1", "norm2", "norm3"):
            m.norm(f"{pre}.{n}", inner)
        for t in ("to_q", "to_k", "to_v"):
            m.lin(f"{pre}.attn1.{t}", inner, inner, bias=False)
        m.lin(f"{pre}.attn1.to_out.0", inner, inner)
        m.lin(f"{pre}.attn2.to_q", inner, inner, bias=False)
        m.lin(f"{pre}.attn2.to_k", inner, CTX, bias=False)
        m.lin(f"{pre}.attn2.to_v", inner, CTX, bias=False)
        m.lin(f"{pre}.attn2.to_out.0", inner, inner)
        if ip:
            m.lin(f"{pre}.attn2.processor.to_k_ip", inner, CTX, bias=False)
            m.lin(f"{pre}.attn2.processor.to_v_ip", inner, CTX, bias=False)
        m.lin(f"{pre}.ff.net.0.proj", 8 * inner, inner)   # GEGLU
        m.lin(f"{pre}.ff.net.2", inner, 4 * inner)

    def transformer(pre, inner, depth):
        m.norm(pre + ".norm", inner)
        m.lin(pre + ".proj_in", inner, inner)     # use_linear_projection
        m.lin(pre + ".proj_out", inner, inner)
        for j in range(depth):
            tblock(f"{pre}.transformer_blocks.{j}", inner)

    m.conv("conv_in", C[0], in_ch)
    m.lin("time_embedding.linear_1", TEMB, C[0])
    m.lin("time_embedding.linear_2", TEMB, TEMB)
    m.lin("add_embedding.linear_1", TEMB, 2816)   # 1280 pooled + 6*256
    m.lin("add_embedding.linear_2", TEMB, TEMB)

    cin = C[0]
    for lvl, c in enumerate(C):
        pre = f"down_blocks.{lvl}"
        for j in range(2):
            resnet(f"{pre}.resnets.{j}", cin if j == 0 else c, c)
            if TDEPTH[lvl]:
                transformer(f"{pre}.attentions.{j}", c, TDEPTH[lvl])
        if lvl < 2:
            m.conv(f"{pre}.downsamplers.0.conv", c, c)    # stride 2
        cin = c

    resnet("mid_block.resnets.0", C[-1], C[-1])
    transformer("mid_block.attentions.0", C[-1], TDEPTH[-1])
    resnet("mid_block.resnets.1", C[-1], C[-1])

    rev = C[::-1]                                          # [1280, 640, 320]
    prev = rev[0]
    for i in range(3):
        out = rev[i]
        below = rev[min(i + 1, 2)]
        pre = f"up_blocks.{i}"
        for j in range(3):
            skip = below if j == 2 else out
            rin = prev if j == 0 else out
            resnet(f"{pre}.resnets.{j}", rin + skip, out, shortcut=True)
            if TDEPTH[2 - i]:
                transformer(f"{pre}.attentions.{j}", out, TDEPTH[2 - i])
        if i < 2:
            m.conv(f"{pre}.upsamplers.0.conv", out, out)
        prev = out

    m.norm("conv_norm_out", C[0])
    m.conv("conv_out", 4, C[0])
    return m


def vae_manifest() -> dict:
    C = [128, 256, 512, 512]
    m = M()

    def resnet(pre, cin, cout):
        m.norm(pre + ".norm1", cin)
        m.conv(pre + ".conv1", cout, cin)
        m.norm(pre + ".norm2", cout)
        m.conv(pre + ".conv2", cout, cout)
        if cin != cout:
            m.conv(pre + ".conv_shortcut", cout, cin, k=1)

    def mid(pre, c):
        resnet(pre + ".resnets.0", c, c)
        a = pre + ".attentions.0"
        m.norm(a + ".group_norm", c)
        for t in ("to_q", "to_k", "to_v"):
            m.lin(f"{a}.{t}", c, c)
        m.lin(a + ".to_out.0", c, c)
        resnet(pre + ".resnets.1", c, c)

    m.conv("encoder.conv_in", C[0], 3)
    cin = C[0]
    for lvl, c in enumerate(C):
        pre = f"encoder.down_blocks.{lvl}"
        for j in range(2):
            resnet(f"{pre}.resnets.{j}", cin if j == 0 else c, c)
        if lvl < 3:
            m.conv(f"{pre}.downsamplers.0.conv", c, c)
        cin = c
    mid("encoder.mid_block", C[-1])
    m.norm("encoder.conv_norm_out", C[-1])
    m.conv("encoder.conv_out", 8, C[-1])

    m.conv("decoder.conv_in", C[-1], 4)
    mid("decoder.mid_block", C[-1])
    rev = C[::-1]                                          # [512,512,256,128]
    prev = rev[0]
    for i, c in enumerate(rev):
        pre = f"decoder.up_blocks.{i}"
        for j in range(3):
            resnet(f"{pre}.resnets.{j}", prev if j == 0 else c, c)
        if i < 3:
            m.conv(f"{pre}.upsamplers.0.conv", c, c)
        prev = c
    m.norm("decoder.conv_norm_out", C[0])
    m.conv("decoder.conv_out", 3, C[0])

    m.conv("quant_conv", 8, 8, k=1)
    m.conv("post_quant_conv", 4, 4, k=1)
    return m


def dump(name, man):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name + ".json")
    with open(path, "w") as f:
        json.dump(dict(man), f, indent=0, sort_keys=True)
    print(f"{name}: {len(man)} keys -> {path}")




def densepose_manifest() -> dict:
    """detectron2 GeneralizedRCNN R50-FPN + DensePose (decoder on) key
    grammar, transcribed from the vendored model code:
    - resnet/FPN naming: gradio_demo/detectron2/modeling/backbone/{resnet,fpn}.py
    - RPN: proposal_generator.rpn_head (rpn.py StandardRPNHead)
    - box head: roi_heads.box_head FastRCNNConvFCHead (NUM_FC=2) +
      box_predictor FastRCNNOutputLayers (num_classes=1)
    - decoder: densepose/modeling/roi_heads/roi_head.py:26-81
    - densepose head: DensePoseV1ConvXHead (8 convs, 512) + predictor
      ConvTranspose2d 4x4 heads (ann_index 2ch, index_uv/u/v 25ch)
    FrozenBatchNorm keys: .norm.{weight,bias,running_mean,running_var}.
    pixel_mean/std + anchor_generator.cell_anchors are constant buffers."""
    m = M()

    def frozen_bn(key, c):
        m[key + ".weight"] = [c]
        m[key + ".bias"] = [c]
        m[key + ".running_mean"] = [c]
        m[key + ".running_var"] = [c]

    def conv_bn(key, o, i, k):
        m[key + ".weight"] = [o, i, k, k]
        frozen_bn(key + ".norm", o)

    m["pixel_mean"] = [3, 1, 1]
    m["pixel_std"] = [3, 1, 1]
    conv_bn("backbone.bottom_up.stem.conv1", 64, 3, 7)
    blocks = (3, 4, 6, 3)
    for li, n in enumerate(blocks):
        width = 64 * 2 ** li
        cin = 64 if li == 0 else 4 * width // 2
        cout = 4 * width
        for bi in range(n):
            pre = f"backbone.bottom_up.res{li + 2}.{bi}"
            c1_in = cin if bi == 0 else cout
            conv_bn(pre + ".conv1", width, c1_in, 1)
            conv_bn(pre + ".conv2", width, width, 3)
            conv_bn(pre + ".conv3", cout, width, 1)
            if bi == 0:
                conv_bn(pre + ".shortcut", cout, c1_in, 1)
    for i, c in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        m.conv(f"backbone.fpn_lateral{i}", 256, c, k=1)
        m.conv(f"backbone.fpn_output{i}", 256, 256, k=3)
    m.conv("proposal_generator.rpn_head.conv", 256, 256, k=3)
    m.conv("proposal_generator.rpn_head.objectness_logits", 3, 256, k=1)
    m.conv("proposal_generator.rpn_head.anchor_deltas", 12, 256, k=1)
    for i in range(5):
        m[f"proposal_generator.anchor_generator.cell_anchors.{i}"] = [3, 4]
    m.lin("roi_heads.box_head.fc1", 1024, 256 * 7 * 7)
    m.lin("roi_heads.box_head.fc2", 1024, 1024)
    m.lin("roi_heads.box_predictor.cls_score", 2, 1024)
    m.lin("roi_heads.box_predictor.bbox_pred", 4, 1024)
    for lvl in range(4):
        for j in range(max(1, lvl)):
            m.conv(f"roi_heads.decoder.p{lvl + 2}.{2 * j}", 256, 256, k=3)
    m.conv("roi_heads.decoder.predictor", 256, 256, k=1)
    m.conv("roi_heads.densepose_head.body_conv_fcn1", 512, 256, k=3)
    for i in range(2, 9):
        m.conv(f"roi_heads.densepose_head.body_conv_fcn{i}", 512, 512, k=3)
    for name, ch in (("ann_index_lowres", 2), ("index_uv_lowres", 25),
                     ("u_lowres", 25), ("v_lowres", 25)):
        # ConvTranspose2d stores (in, out, kh, kw)
        m[f"roi_heads.densepose_predictor.{name}.weight"] = [512, ch, 4, 4]
        m[f"roi_heads.densepose_predictor.{name}.bias"] = [ch]
    return m


if __name__ == "__main__":
    dump("unet_sdxl_tryon", unet_manifest(13, ip=True))
    dump("unet_sdxl_base", unet_manifest(4, ip=False))
    dump("vae_sdxl", vae_manifest())
    dump("densepose_r50fpn", densepose_manifest())
