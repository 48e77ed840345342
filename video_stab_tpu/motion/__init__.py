"""Motion estimation and trajectory filtering."""

from video_stab_tpu.motion.estimate import (
    estimate_similarity_ransac,
    estimate_rigid_closed_form,
    remove_outliers_median,
    transform_params_from_matrix,
)
from video_stab_tpu.motion.filters import (
    box_filter_emit,
    gaussian_filter_emit,
    kalman_step,
    butterworth_cascade,
    adaptive_radius,
)
from video_stab_tpu.motion.intent import (
    MotionIntent,
    analyze_motion_intent,
    intent_correction_scale,
)
from video_stab_tpu.motion.hf import (
    HFState,
    hf_init,
    hf_apply,
)
from video_stab_tpu.motion.homography import (
    estimate_homography_ransac,
    exp_homography,
    log_homography,
    smooth_homography_path,
)
from video_stab_tpu.motion.l1path import l1_smooth_path

__all__ = [
    "estimate_similarity_ransac", "estimate_rigid_closed_form",
    "remove_outliers_median", "transform_params_from_matrix",
    "box_filter_emit", "gaussian_filter_emit", "kalman_step",
    "butterworth_cascade", "adaptive_radius",
    "MotionIntent", "analyze_motion_intent", "intent_correction_scale",
    "l1_smooth_path",
    "estimate_homography_ransac", "log_homography", "exp_homography",
    "smooth_homography_path",
    "HFState", "hf_init", "hf_apply",
]
