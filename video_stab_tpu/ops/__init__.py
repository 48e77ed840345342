"""Pure JAX vision ops.

All ops are pure functions over float32 arrays in the [0, 255] value domain
(matching the uint8 pixel values the reference operates on), channels-last,
BGR channel order. Everything is static-shape and jit-friendly.
"""

from video_stab_tpu.ops.color import (
    bgr_to_gray,
    gray_to_bgr,
    bgr_to_hsv,
    hsv_to_bgr,
    bgr_to_lab,
    lab_to_bgr,
    bgr_to_i420,
    i420_to_bgr,
    saturate_u8,
)
from video_stab_tpu.ops.resize import resize_bilinear, pyr_down, build_pyramid
from video_stab_tpu.ops.warp import (
    warp_affine,
    warp_affine_fast,
    warp_affine_tiled,
    warp_perspective,
    invert_affine,
    rotation_matrix_2d,
    similarity_matrix,
    remap_bilinear,
    BORDER_CONSTANT,
    BORDER_REPLICATE,
    BORDER_REFLECT,
    BORDER_REFLECT_101,
    BORDER_WRAP,
    border_mode_from_name,
)
from video_stab_tpu.ops.filters import (
    gaussian_kernel_1d,
    gaussian_blur,
    box_blur,
    sobel,
    scharr_derivs,
    dilate,
    erode,
    morph_close,
    threshold_binary,
    clahe,
    unsharp_mask,
    bilateral_denoise,
)
from video_stab_tpu.ops.features import (
    min_eig_response,
    good_features_to_track,
)
from video_stab_tpu.ops.fast import (
    brisk_corners,
    fast_corners,
    fast_response,
    orb_corners,
)
from video_stab_tpu.ops.lk import lk_track
from video_stab_tpu.ops.canny import canny_edges
from video_stab_tpu.ops.hough import hough_lines

__all__ = [
    "bgr_to_gray", "gray_to_bgr", "bgr_to_hsv", "hsv_to_bgr",
    "bgr_to_lab", "lab_to_bgr", "saturate_u8",
    "resize_bilinear", "pyr_down", "build_pyramid",
    "warp_affine", "warp_affine_fast", "warp_affine_tiled", "warp_perspective", "invert_affine",
    "rotation_matrix_2d", "similarity_matrix",
    "remap_bilinear",
    "BORDER_CONSTANT", "BORDER_REPLICATE", "BORDER_REFLECT",
    "BORDER_REFLECT_101", "BORDER_WRAP", "border_mode_from_name",
    "gaussian_kernel_1d", "gaussian_blur", "box_blur", "sobel", "scharr_derivs",
    "dilate", "erode", "morph_close", "threshold_binary", "clahe",
    "unsharp_mask", "bilateral_denoise",
    "min_eig_response", "good_features_to_track",
    "fast_response", "fast_corners", "orb_corners", "brisk_corners",
    "lk_track",
    "canny_edges",
    "hough_lines",
]
