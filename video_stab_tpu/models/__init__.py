"""Learned components: detector + multi-object tracker (the
DeepStreamTracker counterpart) and the deep-stabilization transform
predictor."""

from video_stab_tpu.models.detector import (
    TRAFFICCAMNET_LABELS,
    CenterNetDetector,
    DetectorConfig,
    create_detector,
    detect,
    detection_loss,
)
from video_stab_tpu.models.tracker import (
    Detection,
    ObjectTracker,
    TrackerParams,
)
from video_stab_tpu.models.deepstab import (
    DeepStabConfig,
    DeepStabNet,
    create_deepstab,
    predict_transform,
)

__all__ = [
    "TRAFFICCAMNET_LABELS", "CenterNetDetector", "DetectorConfig",
    "create_detector", "detect", "detection_loss",
    "Detection", "ObjectTracker", "TrackerParams",
    "DeepStabConfig", "DeepStabNet", "create_deepstab", "predict_transform",
]
