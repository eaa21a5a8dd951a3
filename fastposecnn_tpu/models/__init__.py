from fastposecnn_tpu.models.resnet import ResNetEncoder, RESNET_SPECS  # noqa: F401
from fastposecnn_tpu.models.fpn import FPNDecoder, SegmentationHead  # noqa: F401
from fastposecnn_tpu.models.pose_regressor import (  # noqa: F401
    PoseRegressorNet,
    MODELS,
)
