"""Core component APIs mirroring the reference's class surface
(vs::Stabilizer / vs::RollCorrection / vs::AutoZoomCrop / vs::Enhancer)."""

from video_stab_tpu.core.params import (
    AutoZoomCropParams,
    EnhancerParams,
    FeatureDetector,
    JitterFrequency,
    LegacyStabilizerParams,
    ModeParams,
    RollCorrectionParams,
    StabilizerParams,
)
from video_stab_tpu.core.state import (
    PATH_RING,
    LegacyState,
    StabilizerState,
    legacy_state_init,
    stabilizer_state_init,
)
from video_stab_tpu.core.stabilizer import (
    Stabilizer,
    stabilizer_analyze_step,
    stabilizer_emit_step,
    stabilizer_init_step,
)
from video_stab_tpu.core.legacy import (
    LegacyStabilizer,
    legacy_analyze_step,
    legacy_emit_step,
    legacy_init_step,
)
from video_stab_tpu.core.enhancer import Enhancer, enhance_frame
from video_stab_tpu.core.rollcorrection import (
    RollCorrection,
    RollState,
    roll_correct_step,
    roll_state_init,
)
from video_stab_tpu.core.autozoomcrop import (
    AutoZoomCrop,
    auto_zoom_crop_step,
    interior_rect,
)

__all__ = [
    "StabilizerParams", "LegacyStabilizerParams", "RollCorrectionParams",
    "EnhancerParams", "AutoZoomCropParams", "ModeParams",
    "FeatureDetector", "JitterFrequency",
    "PATH_RING", "StabilizerState", "LegacyState",
    "stabilizer_state_init", "legacy_state_init",
    "Stabilizer", "stabilizer_init_step", "stabilizer_analyze_step",
    "stabilizer_emit_step",
    "LegacyStabilizer", "legacy_init_step", "legacy_analyze_step",
    "legacy_emit_step",
    "Enhancer", "enhance_frame",
    "RollCorrection", "RollState", "roll_state_init", "roll_correct_step",
    "AutoZoomCrop", "auto_zoom_crop_step", "interior_rect",
]
