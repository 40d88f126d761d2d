"""2D pose models: HRNet/Swin (heatmap), RTMPose (SimCC), person detection."""

from .hrnet import HRNet, HRNET_W32, HRNET_W48
from .rtmpose import RTMPose, CSPNeXt, RTMPOSE_T, RTMPOSE_S, RTMPOSE_M
from .yolox import YOLOX, YOLOX_TINY
from .rtmdet import RTMDet, RTMDET_M, RTMDET_TINY
from .swin import SwinPose, SwinTransformer, SWIN_B, SWIN_L, SWIN_T
from .detector import (
    CenterNetDetector,
    SinglePersonDetector,
    decode_topk,
    full_frame_bboxes,
    select_consistent_boxes,
)
from .registry import (
    MODEL_REGISTRY,
    build_estimator,
    resolve_model_name,
)
from .topdown import (
    TopDownEstimator,
    preprocess_crops,
    center_scale_from_bbox,
    crop_frames,
    IMAGENET_MEAN,
    IMAGENET_STD,
)

__all__ = [
    "HRNet",
    "HRNET_W32",
    "HRNET_W48",
    "RTMPose",
    "YOLOX",
    "YOLOX_TINY",
    "RTMDet",
    "RTMDET_M",
    "RTMDET_TINY",
    "CSPNeXt",
    "RTMPOSE_T",
    "RTMPOSE_S",
    "RTMPOSE_M",
    "SwinPose",
    "SwinTransformer",
    "SWIN_B",
    "SWIN_L",
    "SWIN_T",
    "CenterNetDetector",
    "SinglePersonDetector",
    "decode_topk",
    "select_consistent_boxes",
    "full_frame_bboxes",
    "TopDownEstimator",
    "MODEL_REGISTRY",
    "build_estimator",
    "resolve_model_name",
    "center_scale_from_bbox",
    "crop_frames",
    "preprocess_crops",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]
