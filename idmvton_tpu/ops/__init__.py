"""TPU compute ops: XLA reference implementations + Pallas kernels.

Every op has a pure-jnp reference implementation (used on CPU and as the
numerical ground truth in tests) and, where it is on the hot path, a Pallas
TPU kernel. ``set_default_impl`` flips the dispatch globally.
"""

from idmvton_tpu.ops.dispatch import set_default_impl, get_default_impl
from idmvton_tpu.ops.attention import sdpa, concat_kv_attention, decoupled_ip_attention
from idmvton_tpu.ops.roi_align import roi_align
from idmvton_tpu.ops.nms import box_iou, nms_mask, nms_topk
from idmvton_tpu.ops.rotated_boxes import box_iou_rotated, nms_rotated_mask
from idmvton_tpu.ops.deform_conv import deform_conv2d
