"""Sparse pyramidal Lucas-Kanade optical flow.

TPU-native counterpart of cv::calcOpticalFlowPyrLK / cuda::SparsePyrLKOpticalFlow
(reference: src/Stabilizer.cpp:122-125, 496-504, 611-619 — 15x15 window,
maxLevel 2, 20 iterations, eps 0.03; src/Stabilizer_legacy.cpp:218-224 —
21x21 window, maxLevel 3, 30 iterations, eps 0.01).

The tracker is fully static-shape: a fixed point capacity with a validity
mask, fixed iteration counts with eps early-out via masking, vmapped over
points. Windows are gathered with bilinear sampling (replicate border, like
OpenCV's padded pyramid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from video_stab_tpu.ops.filters import scharr_derivs
from video_stab_tpu.ops.resize import build_pyramid
from video_stab_tpu.ops.warp import sample_bilinear, BORDER_REPLICATE


def _window_offsets(win: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    half = (win - 1) * 0.5
    g = jnp.arange(win, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(g, g, indexing="ij")
    return ox.reshape(-1), oy.reshape(-1)


def _track_point_level(curr: jnp.ndarray, i_win: jnp.ndarray,
                       ix_win: jnp.ndarray, iy_win: jnp.ndarray,
                       pt_guess: jnp.ndarray, offs: tuple,
                       iters: int, eps: float,
                       min_eig_thresh: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Iterate one point at one pyramid level. Returns (new_pt, ok)."""
    ox, oy = offs
    g11 = jnp.sum(ix_win * ix_win)
    g12 = jnp.sum(ix_win * iy_win)
    g22 = jnp.sum(iy_win * iy_win)
    det = g11 * g22 - g12 * g12
    half_tr = 0.5 * (g11 + g22)
    min_eig = half_tr - jnp.sqrt(jnp.maximum(half_tr * half_tr - det, 0.0))
    win_area = ox.shape[0]
    ok = (det > 1e-7) & (min_eig / win_area > min_eig_thresh)
    inv11 = jnp.where(ok, g22 / jnp.where(ok, det, 1.0), 0.0)
    inv12 = jnp.where(ok, -g12 / jnp.where(ok, det, 1.0), 0.0)
    inv22 = jnp.where(ok, g11 / jnp.where(ok, det, 1.0), 0.0)

    def body(_, carry):
        pt, done = carry
        j_win = sample_bilinear(curr, pt[0] + ox, pt[1] + oy, BORDER_REPLICATE)
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
    derivs = [scharr_derivs(p) for p in prev_pyr]
    offs = _window_offsets(win)
    ox, oy = offs

    def track_one(pt0, valid):
        scale_top = 1.0 / (2 ** max_level)
        pt_prev_top = pt0 * scale_top
        guess = pt_prev_top
        ok = valid
        for level in range(max_level, -1, -1):
            prev_l = prev_pyr[level]
            curr_l = curr_pyr[level]
            ix_l, iy_l = derivs[level]
            pt_prev = pt0 / (2 ** level)
            i_win = sample_bilinear(prev_l, pt_prev[0] + ox, pt_prev[1] + oy,
                                    BORDER_REPLICATE)
            ix_win = sample_bilinear(ix_l, pt_prev[0] + ox, pt_prev[1] + oy,
                                     BORDER_REPLICATE)
            iy_win = sample_bilinear(iy_l, pt_prev[0] + ox, pt_prev[1] + oy,
                                     BORDER_REPLICATE)
            new_pt, lvl_ok = _track_point_level(
                curr_l, i_win, ix_win, iy_win, guess, offs, iters, eps,
                min_eig_thresh)
            ok = ok & lvl_ok
            guess = jnp.where(ok, new_pt, guess)
            if level > 0:
                guess = guess * 2.0
            else:
                j_win = sample_bilinear(curr_l, guess[0] + ox, guess[1] + oy,
                                        BORDER_REPLICATE)
                err = jnp.mean(jnp.abs(j_win - i_win))
        inside = ((guess[0] >= 0) & (guess[0] <= w - 1) &
                  (guess[1] >= 0) & (guess[1] <= h - 1))
        return guess, ok & inside, err

    curr_pts, status, err = jax.vmap(track_one)(prev_pts, pts_mask)
    return curr_pts, status, err
