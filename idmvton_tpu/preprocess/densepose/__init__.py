from idmvton_tpu.preprocess.densepose.rcnn import (
    DensePoseConfig, init_densepose_rcnn, densepose_rcnn_apply,
)
from idmvton_tpu.preprocess.densepose.visualize import DensePose
