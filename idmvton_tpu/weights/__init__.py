from idmvton_tpu.weights.converter import (
    convert_unet, convert_vae, convert_clip_text, convert_clip_vision,
    convert_resampler, export_unet, export_vae, export_clip_text,
    export_clip_vision, export_resampler, load_state_dict,
)
