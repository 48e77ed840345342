"""Fused TPU Pallas kernels for the hot paths.

Kernels auto-dispatch: compiled Mosaic on TPU, interpreter elsewhere (so the
same call sites run in CPU CI). The headline kernel is the full-frame
affine warp (warp.py — the emit hot path, 3.6x the XLA formulation);
DESIGN.md §5 records which other ops got kernels and which XLA already
fuses optimally.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return not on_tpu()


def box_filter_convolve(path, r: int):
    """Trajectory box filter (stabilizer_cuda.cu counterpart)."""
    from video_stab_tpu.pallas.traj import box_filter_convolve as _f
    return _f(path, r, interpret=_interpret())


def box_filter_centered(path, r: int):
    """Centered clamped-window box filter (the stabilizer's smoother)."""
    from video_stab_tpu.pallas.traj import box_filter_centered as _f
    return _f(path, r, interpret=_interpret())


def corner_response(gray, block_size: int = 3, aperture: int = 3):
    """Fused min-eig response + peak mask."""
    from video_stab_tpu.pallas.features import corner_response as _f
    return _f(gray, block_size, aperture, interpret=_interpret())


def enhance_pointwise(img, **kw):
    """Fused pointwise enhancement pass."""
    from video_stab_tpu.pallas.enhance import enhance_pointwise as _f
    return _f(img, interpret=_interpret(), **kw)


__all__ = ["on_tpu", "box_filter_convolve", "box_filter_centered",
           "corner_response", "enhance_pointwise"]
