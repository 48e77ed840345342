"""Hough line transform with a fixed-capacity line list.

TPU-native counterpart of cv::cuda::createHoughLinesDetector
(reference: src/RollCorrection.cpp:66-73 — rho 1.0, theta pi/180,
threshold 100). The (rho, theta) accumulator is built with a vectorized
scatter-add over all pixels weighted by the edge mask (no data-dependent
shapes); peaks are 4-neighbour local maxima over the accumulator and the
top-K by votes are returned with a validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("rho", "theta", "max_lines"))
def hough_lines(edges: jnp.ndarray, rho: float = 1.0,
                theta: float = float(jnp.pi) / 180.0, threshold: int = 100,
                max_lines: int = 256,
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect lines in a binary edge map.

    Args:
      edges: (H, W) edge map; any value > 0 counts as an edge pixel.

    Returns:
      lines: (max_lines, 2) float32 rows of (rho, theta), vote-descending.
      votes: (max_lines,) float32 accumulator votes.
      mask:  (max_lines,) bool — True where votes > threshold.
    """
    h, w = edges.shape
    n_theta = int(round(jnp.pi / theta))
    n_rho = int(round(((w + h) * 2 + 1) / rho))
    center = (n_rho - 1) // 2

    thetas = jnp.arange(n_theta, dtype=jnp.float32) * theta
    cos_t = jnp.cos(thetas) / rho
    sin_t = jnp.sin(thetas) / rho

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    weight = (edges > 0).astype(jnp.float32).reshape(-1)

    def one_theta(ct, st):
        ridx = jnp.round(xs * ct + ys * st).astype(jnp.int32) + center
        acc = jnp.zeros((n_rho,), jnp.float32).at[ridx.reshape(-1)].add(weight)
        return acc

    acc = jax.vmap(one_theta)(cos_t, sin_t)  # (n_theta, n_rho)
    acc = acc.T  # (n_rho, n_theta)

    # 4-neighbour local maxima (matching OpenCV's > left/up, >= right/down).
    up = jnp.pad(acc[:-1, :], ((1, 0), (0, 0)))
    down = jnp.pad(acc[1:, :], ((0, 1), (0, 0)))
    left = jnp.pad(acc[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(acc[:, 1:], ((0, 0), (0, 1)))
    is_peak = (acc > up) & (acc >= down) & (acc > left) & (acc >= right)
    peak_votes = jnp.where(is_peak, acc, 0.0)

    k = min(max_lines, n_rho * n_theta)
    votes, idx = jax.lax.top_k(peak_votes.reshape(-1), k)
    r_idx = idx // n_theta
    t_idx = idx % n_theta
    line_rho = (r_idx - center).astype(jnp.float32) * rho
    line_theta = t_idx.astype(jnp.float32) * theta
    lines = jnp.stack([line_rho, line_theta], axis=-1)
    mask = votes > threshold
    if k < max_lines:
        pad = max_lines - k
        lines = jnp.pad(lines, ((0, pad), (0, 0)))
        votes = jnp.pad(votes, (0, pad))
        mask = jnp.pad(mask, (0, pad))
    return lines, votes, mask
