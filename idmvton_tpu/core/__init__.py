from idmvton_tpu.core.dtypes import Policy, DEFAULT_POLICY, FP32_POLICY
from idmvton_tpu.core.config import (
    UNetConfig,
    VAEConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    ResamplerConfig,
    SchedulerConfig,
)
