"""Model configuration dataclasses.

One config system (plain frozen dataclasses) replacing the reference's three
coexisting ones (argparse flags, diffusers ConfigMixin JSON, yacs CfgNode —
see SURVEY.md §5 "Config / flag system").

Canonical instances mirror the published SDXL / IDM-VTON shapes:
- TryonNet:   SDXL-inpainting UNet with a 13-channel conv_in and IP-Adapter
  decoupled cross-attention (reference: src/unet_hacked_tryon.py:204,
  train_xl.py:359-373 conv_in 9->13 expansion).
- GarmentNet: frozen SDXL-base UNet, 4-channel input, emits per-transformer-block
  pre-attention hidden states (reference: src/unet_hacked_garmnet.py:80).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Parametric SDXL-family UNet2DCondition config.

    ``down_block_types`` / ``up_block_types`` entries are "plain" (resnets only)
    or "attn" (resnets + spatial transformers). ``transformer_depth`` gives the
    number of BasicTransformerBlocks per Transformer2D at each channel level.
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = ("plain", "attn", "attn")
    up_block_types: Tuple[str, ...] = ("attn", "attn", "plain")
    layers_per_block: int = 2
    transformer_depth: Tuple[int, ...] = (0, 2, 10)  # per level (down order)
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    norm_num_groups: int = 32
    time_embed_dim_mult: int = 4  # time_embed_dim = block_out_channels[0] * mult

    # SDXL "text_time" additional conditioning (micro-conds + pooled text).
    # reference: src/unet_hacked_tryon.py addition_embed_type="text_time";
    # GarmentNet runs with addition_embed disabled (train_xl.py:324-325,
    # tryon_pipeline.py:1787 calls unet_encoder without added_cond_kwargs).
    addition_embed: bool = True
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816  # 1280 pooled + 6*256

    # Garment conditioning role:
    #   "none"    — vanilla SDXL UNet
    #   "emit"    — GarmentNet: collect pre-attn hidden states per block
    #   "consume" — TryonNet: self-attention KV-concat with emitted features
    garment_mode: str = "none"

    # IP-Adapter-plus decoupled image cross-attention
    # (reference: ip_adapter/attention_processor.py:1879 IPAttnProcessor2_0).
    ip_adapter: bool = False
    ip_num_tokens: int = 16
    ip_scale: float = 1.0

    # GarmentNet skips its final plain up-block + conv_out — it only needs the
    # features from cross-attn blocks (reference: src/unet_hacked_garmnet.py:1255-1284).
    skip_final_output: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)

    @property
    def num_garment_features(self) -> int:
        """Number of BasicTransformerBlocks that emit/consume garment features."""
        n = 0
        for lvl, bt in enumerate(self.down_block_types):
            if bt == "attn":
                n += self.layers_per_block * self.transformer_depth[lvl]
        n += self.transformer_depth[-1]  # mid
        for i, bt in enumerate(self.up_block_types):
            lvl = self.num_levels - 1 - i
            if bt == "attn":
                n += (self.layers_per_block + 1) * self.transformer_depth[lvl]
        return n

    # ---- canonical instances -------------------------------------------------

    @staticmethod
    def sdxl_tryon() -> "UNetConfig":
        """TryonNet: 13-ch SDXL-inpainting UNet + IP-Adapter + garment consume.

        13 input channels = noisy latent 4 + inpaint mask 1 + masked-person
        latent 4 + DensePose latent 4 (reference: train_xl.py:359-373).
        num_garment_features = 2*2 + 2*10 + 10 + 3*10 + 3*2 = 70.
        """
        return UNetConfig(
            in_channels=13,
            garment_mode="consume",
            ip_adapter=True,
        )

    @staticmethod
    def sdxl_garment() -> "UNetConfig":
        """GarmentNet: frozen SDXL-base UNet emitting reference features."""
        return UNetConfig(
            in_channels=4,
            garment_mode="emit",
            addition_embed=False,
            skip_final_output=True,
        )

    @staticmethod
    def tiny(garment_mode: str = "none", **kw) -> "UNetConfig":
        """Small config for tests: same topology, tiny widths."""
        defaults = dict(
            in_channels=13 if garment_mode == "consume" else 4,
            out_channels=4,
            block_out_channels=(32, 64, 128),
            layers_per_block=2,
            transformer_depth=(0, 1, 2),
            attention_head_dim=16,
            cross_attention_dim=64,
            norm_num_groups=8,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=64 + 6 * 8,
            garment_mode=garment_mode,
            ip_adapter=(garment_mode == "consume"),
            ip_num_tokens=4,
            addition_embed=(garment_mode != "emit"),
            skip_final_output=(garment_mode == "emit"),
        )
        defaults.update(kw)
        return UNetConfig(**defaults)

    @staticmethod
    def micro(garment_mode: str = "none", **kw) -> "UNetConfig":
        """Smallest config that still exercises every block kind (plain+attn
        down/up, mid, emit/consume threading, IP tokens): 2 levels, 1 layer
        per block, transformer depth 1. For MECHANICS tests (CLI cadence,
        optimizer trajectories, sharding layouts) where trace/compile time
        on a 1-CPU host dominates and widths are irrelevant to the property
        under test. Numeric-parity and e2e tests should keep ``tiny``."""
        defaults = dict(
            in_channels=13 if garment_mode == "consume" else 4,
            out_channels=4,
            block_out_channels=(16, 32),
            down_block_types=("plain", "attn"),
            up_block_types=("attn", "plain"),
            layers_per_block=1,
            transformer_depth=(0, 1),
            attention_head_dim=8,
            cross_attention_dim=64,
            norm_num_groups=8,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=64 + 6 * 8,
            garment_mode=garment_mode,
            ip_adapter=(garment_mode == "consume"),
            ip_num_tokens=4,
            addition_embed=(garment_mode != "emit"),
            skip_final_output=(garment_mode == "emit"),
        )
        defaults.update(kw)
        return UNetConfig(**defaults)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """SDXL AutoencoderKL (madebyollin/sdxl-vae-fp16-fix shapes)."""

    in_channels: int = 3
    latent_channels: int = 4
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025  # reference: SDXL vae config; tryon_pipeline.py:1654
    # The reference force-upcasts its decoder to fp32 because the fp16 SDXL
    # VAE overflows (tryon_pipeline.py:1868-1880). bf16 has fp32's exponent
    # range, so that failure mode does not exist on TPU: default to bf16
    # compute (fp32 norms as everywhere), which also halves decode HBM
    # traffic. bf16's ~4e-3 relative rounding is the same order as the
    # uint8 pixel quantization (1/255) the output feeds into. Set True for
    # bit-strict fp32 parity runs (golden SSIM fixtures).
    force_upcast: bool = False

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)

    @staticmethod
    def sdxl() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(base_channels=32, channel_mults=(1, 2, 4, 4),
                         layers_per_block=1, norm_num_groups=8)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text tower. SDXL uses two: CLIP-L/14 and OpenCLIP bigG/14.

    SDXL consumes hidden_states[-2] of both, concatenated to 2048, plus the
    bigG pooled projection (reference: src/tryon_pipeline.py:609-645).
    """

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    projection_dim: int = 768
    # CLIP-L uses quick_gelu; OpenCLIP bigG uses gelu.
    hidden_act: str = "quick_gelu"
    # bigG pools at the argmax(eos) token through a projection; CLIP-L's pooled
    # output is unused by SDXL.
    use_final_projection: bool = False

    @staticmethod
    def clip_l() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def clip_bigg() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280,
            intermediate_size=5120,
            num_layers=32,
            num_heads=20,
            projection_dim=1280,
            hidden_act="gelu",
            use_final_projection=True,
        )

    @staticmethod
    def tiny(**kw) -> "CLIPTextConfig":
        d = dict(vocab_size=1000, hidden_size=32, intermediate_size=64,
                 num_layers=2, num_heads=4, projection_dim=32)
        d.update(kw)
        return CLIPTextConfig(**d)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT-H/14 vision tower (reference: ckpt/image_encoder/config.json).

    IP-Adapter-plus consumes hidden_states[-2] (257 x 1280), not the projected
    embedding (reference: src/tryon_pipeline.py:460-484 encode_image).
    """

    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    hidden_act: str = "gelu"

    @staticmethod
    def vit_h() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                num_layers=2, num_heads=4, image_size=28,
                                patch_size=14, projection_dim=32)


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """IP-Adapter-plus Perceiver Resampler (reference: ip_adapter/resampler.py:129,
    instantiated at src/unet_hacked_tryon.py:476-485: dim 1280, depth 4,
    heads 20, dim_head 64, 16 queries, embedding_dim 1280, output_dim 2048)."""

    dim: int = 1280
    depth: int = 4
    heads: int = 20
    dim_head: int = 64
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 2048
    ff_mult: int = 4

    @staticmethod
    def sdxl_plus() -> "ResamplerConfig":
        return ResamplerConfig()

    @staticmethod
    def tiny() -> "ResamplerConfig":
        return ResamplerConfig(dim=32, depth=2, heads=4, dim_head=8,
                               num_queries=4, embedding_dim=32, output_dim=64,
                               ff_mult=2)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDPM scheduler (reference: diffusers DDPMScheduler from the
    yisol/IDM-VTON `scheduler` subfolder; train_xl.py:317 sets
    rescale_betas_zero_snr=True)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    rescale_betas_zero_snr: bool = False
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    # deterministic DDPM variance handling for the sampling step
    variance_type: str = "fixed_small"

    @staticmethod
    def sdxl_inference() -> "SchedulerConfig":
        return SchedulerConfig()

    @staticmethod
    def train() -> "SchedulerConfig":
        return SchedulerConfig(rescale_betas_zero_snr=True)
