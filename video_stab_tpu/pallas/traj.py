"""Trajectory box-filter Pallas kernel.

Counterpart of the reference's one raw CUDA kernel, boxFilterConvolveCUDA
(src/stabilizer_cuda.cu:7-67): median-pad the trajectory with 2r samples of
the (upper) median, then result[i] = mean(padded[i .. i+r-1]) — i.e. the
mean of the r original samples ENDING at i-1 (the kernel's left-window
convention).

The streaming stabilizer doesn't need this (it uses O(window) ring emission,
motion/filters.py); this kernel serves the offline/batch API
(video_stab_tpu.offline) where whole trajectories are smoothed at once, and
stands as the 1:1 replacement for the reference's native kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 8 * LANES     # one f32 tile per grid step


def _box_kernel(padded_ref, out_ref, *, r: int, n: int):
    """Each grid step produces CHUNK outputs from CHUNK + r inputs.

    out[i] = sum(padded[i .. i+r-1]) / r. The windowed sum is r shifted VPU
    adds, each a dynamic-start slice of the (1, L) VMEM ref (Mosaic lowers
    ref slicing with pl.ds; value-level cumsum/dynamic_slice it does not).
    r is small (<= ~50) so r adds per CHUNK vector are cheap.
    """
    i = pl.program_id(0)
    base = pl.multiple_of(i * CHUNK, CHUNK)
    r_pad = ((r + LANES - 1) // LANES) * LANES
    # One aligned ref load (Mosaic requires lane-aligned vector loads), then
    # r static value-level slices — lowered as in-register shifts.
    ext = padded_ref[:, pl.ds(base, CHUNK + r_pad)]
    acc = jnp.zeros((1, CHUNK), padded_ref.dtype)
    for k in range(r):
        acc = acc + jax.lax.slice(ext, (0, k), (1, k + CHUNK))
    out_ref[:, pl.ds(base, CHUNK)] = acc / float(r)


def _median_upper(x: jnp.ndarray) -> jnp.ndarray:
    """std::nth_element upper median (stabilizer_cuda.cu:23-25)."""
    s = jnp.sort(x)
    return s[x.shape[0] // 2]


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def box_filter_convolve(path: jnp.ndarray, r: int,
                        interpret: bool = False) -> jnp.ndarray:
    """boxFilterConvolveCUDA semantics over a (N,) or (N, C) trajectory.

    Pallas on TPU; pass interpret=True (or run via the auto-dispatch in
    __init__) on CPU.
    """
    if r <= 0:
        return path
    squeeze = path.ndim == 1
    p2 = path[:, None] if squeeze else path
    n, c = p2.shape

    outs = []
    for ch in range(c):
        x = p2[:, ch]
        med = _median_upper(x)
        n_chunks = pl.cdiv(n, CHUNK)
        r_pad = ((r + LANES - 1) // LANES) * LANES
        padded_len = n_chunks * CHUNK + r_pad
        # Reference layout (stabilizer_cuda.cu:27-31): r median samples
        # BEFORE the path, median fill after; out[i] covers padded[i..i+r-1],
        # i.e. the window of r original samples ending at index i-1.
        padded = jnp.full((1, padded_len), med, x.dtype)
        padded = jax.lax.dynamic_update_slice(padded, x[None, :], (0, r))
        out = pl.pallas_call(
            functools.partial(_box_kernel, r=r, n=n),
            out_shape=jax.ShapeDtypeStruct((1, n_chunks * CHUNK), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(n_chunks,),
            interpret=interpret,
        )(padded)
        outs.append(out[0, :n])
    res = jnp.stack(outs, axis=1)
    return res[:, 0] if squeeze else res


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def box_filter_centered(path: jnp.ndarray, r: int,
                        interpret: bool = False) -> jnp.ndarray:
    """CENTERED count-normalized box filter — the semantics the stabilizer
    actually smooths with (boxFilterConvolve, src/Stabilizer.cpp:1156-1168:
    window [i-r, i+r] clamped to the path, divided by the true count).
    Reuses the windowed-sum kernel on a zero-padded path with a window of
    2r+1, then renormalizes by the per-index clamped count. Identity when
    n <= r (Stabilizer.cpp:1148-1150)."""
    if r <= 0:
        return path
    squeeze = path.ndim == 1
    p2 = path[:, None] if squeeze else path
    n, c = p2.shape
    w = 2 * r + 1

    outs = []
    for ch in range(c):
        x = p2[:, ch]
        n_chunks = pl.cdiv(n, CHUNK)
        w_pad = ((w + LANES - 1) // LANES) * LANES
        padded_len = n_chunks * CHUNK + w_pad
        padded = jnp.zeros((1, padded_len), x.dtype)
        # out[i] = sum(padded[i..i+w-1]) / w; with the path at offset r the
        # window covers original [i-r, i+r].
        padded = jax.lax.dynamic_update_slice(padded, x[None, :], (0, r))
        out = pl.pallas_call(
            functools.partial(_box_kernel, r=w, n=n),
            out_shape=jax.ShapeDtypeStruct((1, n_chunks * CHUNK), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(n_chunks,),
            interpret=interpret,
        )(padded)
        idx = jnp.arange(n)
        count = (jnp.minimum(idx + r, n - 1) -
                 jnp.maximum(idx - r, 0) + 1).astype(x.dtype)
        outs.append(out[0, :n] * float(w) / count)
    res = jnp.stack(outs, axis=1)
    res = jnp.where(n <= r, p2, res)
    return res[:, 0] if squeeze else res


def box_filter_convolve_reference(path: jnp.ndarray, r: int) -> jnp.ndarray:
    """Pure-jnp oracle for tests (same semantics, no Pallas)."""
    if r <= 0:
        return path
    squeeze = path.ndim == 1
    p2 = path[:, None] if squeeze else path
    n, c = p2.shape
    outs = []
    for ch in range(c):
        x = p2[:, ch]
        med = _median_upper(x)
        padded = jnp.concatenate([jnp.full((r,), med, x.dtype), x,
                                  jnp.full((r,), med, x.dtype)])
        csum = jnp.cumsum(jnp.concatenate([jnp.zeros((1,), x.dtype), padded]))
        idx = jnp.arange(n)
        outs.append((csum[idx + r] - csum[idx]) / float(r))
    res = jnp.stack(outs, axis=1)
    return res[:, 0] if squeeze else res
