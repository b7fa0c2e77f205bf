from idmvton_tpu.pipeline.tryon import TryonModels, TryonPipeline, encode_prompt_sdxl
