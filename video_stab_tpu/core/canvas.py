"""Virtual canvas stabilization — TPU rebuild of the reference's
applyVirtualCanvasStabilization chain (src/Stabilizer.cpp:2066-2443).

The reference keeps a deque of 30 recent frames + transforms
(temporalFrameBuffer_, Stabilizer.cpp:2153-2167), detects empty regions by
contouring the warped frame (2214-2279) and fills them per-pixel from
motion-compensated history with seamless blending (2350-2398) — all
data-dependent host loops.

TPU reformulation: the frame history collapses into a RUNNING CANVAS
accumulator (scale_factor larger than the frame). Each emitted frame is
warped into canvas space; covered pixels refresh the canvas, uncovered
pixels keep their (temporally filled) history. A blurred coverage mask
provides the seamless edge blend (edge_blend_radius). Output is the
center crop at frame size — same visible behavior (jitter-free borders
filled from history), O(1) memory instead of 30 frames, and every step a
static-shape jit op.
"""

from __future__ import annotations

import jax.numpy as jnp

from video_stab_tpu.ops.filters import gaussian_blur
from video_stab_tpu.ops.warp import BORDER_CONSTANT, similarity_matrix, warp_affine_tiled


def canvas_shape(params, height: int, width: int) -> tuple[int, int]:
    s = params.canvas_scale_factor
    return int(round(height * s)), int(round(width * s))


def canvas_init_value(params, height: int, width: int):
    hc, wc = canvas_shape(params, height, width)
    return (jnp.zeros((hc, wc, 3), jnp.float32),
            jnp.zeros((hc, wc), jnp.float32))


def virtual_canvas_apply(params, canvas: jnp.ndarray, weight: jnp.ndarray,
                         frame_f32: jnp.ndarray, correction: jnp.ndarray,
                         ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One canvas update + composite.

    frame_f32: (H, W, 3); correction: (3,) stabilizing (dx, dy, da).
    Returns (new_canvas, new_weight, out_frame (H, W, 3)).
    """
    h, w = frame_f32.shape[:2]
    hc, wc = canvas.shape[:2]
    oy = (hc - h) / 2.0
    ox = (wc - w) / 2.0

    m = similarity_matrix(correction[0] + ox, correction[1] + oy,
                          correction[2])
    # The placement translation (ox, oy) is static; size the tiled warp's
    # envelope to cover it plus the dynamic correction.
    ms = int(max(ox, oy)) + 160
    warped = warp_affine_tiled(frame_f32, m, out_h=hc, out_w=wc,
                               border_mode=BORDER_CONSTANT, max_shift=ms)
    coverage = warp_affine_tiled(jnp.ones((h, w), jnp.float32), m, out_h=hc,
                                 out_w=wc, border_mode=BORDER_CONSTANT,
                                 max_shift=ms)

    # Canvas refresh: covered pixels adopt the new frame (weighted by
    # canvas_blend_weight against history for temporal smoothness); empty
    # pixels keep history (the "temporal fill").
    bw = params.canvas_blend_weight
    has_hist = weight > 0.0
    cov3 = coverage[:, :, None]
    refreshed = jnp.where(
        has_hist[:, :, None],
        bw * warped + (1.0 - bw) * canvas,
        warped)
    new_canvas = cov3 * refreshed + (1.0 - cov3) * canvas
    new_weight = jnp.maximum(weight * 0.995, coverage)

    # Seamless composite for the OUTPUT: blurred coverage as the blend alpha
    # (the reference's edge-radius blend, Stabilizer.cpp:2350-2398).
    sigma = max(params.edge_blend_radius / 3.0, 0.5)
    alpha = jnp.clip(gaussian_blur(coverage, sigma), 0.0, 1.0)
    hist_valid = (weight > 0.0).astype(jnp.float32)
    # Where history exists, blend; where it doesn't, show the frame as-is.
    a = alpha + (1.0 - alpha) * (1.0 - hist_valid)
    composite = a[:, :, None] * warped + \
        (1.0 - a)[:, :, None] * canvas

    y0 = int(round(oy))
    x0 = int(round(ox))
    out = composite[y0:y0 + h, x0:x0 + w]
    return new_canvas, new_weight, out
