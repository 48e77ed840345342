"""Sparse pyramidal Lucas-Kanade optical flow.

TPU-native counterpart of cv::calcOpticalFlowPyrLK / cuda::SparsePyrLKOpticalFlow
(reference: src/Stabilizer.cpp:122-125, 496-504, 611-619 — 15x15 window,
maxLevel 2, 20 iterations, eps 0.03; src/Stabilizer_legacy.cpp:218-224 —
21x21 window, maxLevel 3, 30 iterations, eps 0.01).

The tracker is fully static-shape: a fixed point capacity with a validity
mask, fixed iteration counts with eps early-out via masking, vmapped over
points.

TPU-native sampling: a window sample at a sub-pixel point is NOT a
per-pixel gather (XLA gathers run ~34 ns/element on TPU — measured; that
put the original gather formulation at 131 ms/frame at the reference
budget). Because the window is a RIGID grid, the whole win x win bilinear
sample equals ONE integer dynamic_slice of (win+1, win+1) plus a 4-tap
corner blend with the point's fractional offset — pure slices and vector
math (~12 ms -> dominated by the solve itself). Replicate-border semantics
come from edge-padding each pyramid level once per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from video_stab_tpu.ops.filters import scharr_derivs
from video_stab_tpu.ops.resize import build_pyramid


def _extract_window(padded: jnp.ndarray, pt: jnp.ndarray, win: int,
                    pad: int) -> jnp.ndarray:
    """Bilinear win x win window of `padded` centered at pt (x, y) given in
    UNPADDED image coordinates. padded = jnp.pad(img, pad, mode="edge").

    Equivalent to sampling img at pt + offsets with replicate border for
    any pt with |pt| within `pad - win/2 - 1` of the image bounds; the
    dynamic_slice start clamp keeps it safe (if wrong) beyond that, and
    callers mark such points as lost anyway.
    """
    half = (win - 1) * 0.5
    # Window top-left corner in padded coords.
    cx = pt[0] - half + pad
    cy = pt[1] - half + pad
    x0 = jnp.floor(cx).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    fx = cx - x0.astype(jnp.float32)
    fy = cy - y0.astype(jnp.float32)
    if padded.ndim == 3:    # (K, H, W): K stacked planes, same window
        p = jax.lax.dynamic_slice(
            padded, (0, y0, x0), (padded.shape[0], win + 1, win + 1))
        w00 = (1 - fy) * (1 - fx)
        w01 = (1 - fy) * fx
        w10 = fy * (1 - fx)
        w11 = fy * fx
        return (w00 * p[:, :-1, :-1] + w01 * p[:, :-1, 1:] +
                w10 * p[:, 1:, :-1] + w11 * p[:, 1:, 1:])
    p = jax.lax.dynamic_slice(padded, (y0, x0), (win + 1, win + 1))
    return ((1 - fy) * (1 - fx) * p[:-1, :-1] + (1 - fy) * fx * p[:-1, 1:] +
            fy * (1 - fx) * p[1:, :-1] + fy * fx * p[1:, 1:])


def _track_point_level(curr_pad: jnp.ndarray, i_win: jnp.ndarray,
                       ix_win: jnp.ndarray, iy_win: jnp.ndarray,
                       pt_guess: jnp.ndarray, win: int, pad: int,
                       iters: int, eps: float,
                       min_eig_thresh: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Iterate one point at one pyramid level. Returns (new_pt, ok)."""
    g11 = jnp.sum(ix_win * ix_win)
    g12 = jnp.sum(ix_win * iy_win)
    g22 = jnp.sum(iy_win * iy_win)
    det = g11 * g22 - g12 * g12
    half_tr = 0.5 * (g11 + g22)
    min_eig = half_tr - jnp.sqrt(jnp.maximum(half_tr * half_tr - det, 0.0))
    win_area = win * win
    ok = (det > 1e-7) & (min_eig / win_area > min_eig_thresh)
    inv11 = jnp.where(ok, g22 / jnp.where(ok, det, 1.0), 0.0)
    inv12 = jnp.where(ok, -g12 / jnp.where(ok, det, 1.0), 0.0)
    inv22 = jnp.where(ok, g11 / jnp.where(ok, det, 1.0), 0.0)

    def body(_, carry):
        pt, done = carry
        j_win = _extract_window(curr_pad, pt, win, pad)
        diff = j_win - i_win
        b1 = jnp.sum(diff * ix_win)
        b2 = jnp.sum(diff * iy_win)
        dx = -(inv11 * b1 + inv12 * b2)
        dy = -(inv12 * b1 + inv22 * b2)
        step = jnp.where(done, 0.0, 1.0)
        new_pt = pt + step * jnp.stack([dx, dy])
        done = done | (dx * dx + dy * dy <= eps * eps)
        return new_pt, done

    pt, _ = jax.lax.fori_loop(0, iters, body, (pt_guess, ~ok))
    return pt, ok


@functools.partial(jax.jit, static_argnames=("win", "max_level", "iters"))
def lk_track(prev_gray: jnp.ndarray, curr_gray: jnp.ndarray,
             prev_pts: jnp.ndarray, pts_mask: jnp.ndarray,
             win: int = 15, max_level: int = 2, iters: int = 20,
             eps: float = 0.03, min_eig_thresh: float = 1e-4,
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Track ``prev_pts`` from prev_gray to curr_gray.

    Args:
      prev_gray/curr_gray: (H, W) float32 u8-domain grayscale.
      prev_pts: (N, 2) float32 (x, y).
      pts_mask: (N,) bool validity of inputs.

    Returns:
      curr_pts: (N, 2) float32 tracked positions.
      status:   (N,) bool — tracked successfully and inside the image.
      err:      (N,) float32 — mean abs intensity diff over the final window
                (OpenCV's default err output; used by the legacy path's
                err < 30 filter, Stabilizer_legacy.cpp:228-233).
    """
    h, w = curr_gray.shape
    prev_pyr = build_pyramid(prev_gray, max_level)
    curr_pyr = build_pyramid(curr_gray, max_level)
    # Edge-pad once per frame: window extraction then needs no border logic
    # (the padding margin covers the window plus LK drift slack).
    pad = (win + 1) // 2 + 8
    # Template plane stack per level: [image, d/dx, d/dy] extracted with ONE
    # slice per point.
    prev_stk = []
    for p in prev_pyr:
        ix, iy = scharr_derivs(p)
        prev_stk.append(jnp.pad(jnp.stack([p, ix, iy]),
                                ((0, 0), (pad, pad), (pad, pad)),
                                mode="edge"))
    curr_pad = [jnp.pad(c, pad, mode="edge") for c in curr_pyr]

    def track_one(pt0, valid):
        scale_top = 1.0 / (2 ** max_level)
        guess = pt0 * scale_top
        ok = valid
        for level in range(max_level, -1, -1):
            pt_prev = pt0 / (2 ** level)
            tmpl = _extract_window(prev_stk[level], pt_prev, win, pad)
            i_win, ix_win, iy_win = tmpl[0], tmpl[1], tmpl[2]
            new_pt, lvl_ok = _track_point_level(
                curr_pad[level], i_win, ix_win, iy_win, guess, win, pad,
                iters, eps, min_eig_thresh)
            ok = ok & lvl_ok
            guess = jnp.where(ok, new_pt, guess)
            if level > 0:
                guess = guess * 2.0
            else:
                j_win = _extract_window(curr_pad[level], guess, win, pad)
                err = jnp.mean(jnp.abs(j_win - i_win))
        inside = ((guess[0] >= 0) & (guess[0] <= w - 1) &
                  (guess[1] >= 0) & (guess[1] <= h - 1))
        return guess, ok & inside, err

    curr_pts, status, err = jax.vmap(track_one)(prev_pts, pts_mask)
    return curr_pts, status, err
