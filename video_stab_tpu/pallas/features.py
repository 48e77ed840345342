"""Fused corner-response Pallas kernel.

The GFTT front half (cv::cornerMinEigenVal + 3x3 NMS) is a chain of small
stencils: Sobel dx/dy -> three products -> 3x3 box sums -> min-eigenvalue ->
3x3 peak compare. Under plain XLA that is several fusion groups with HBM
round-trips between them; here each row tile is DMA'd HBM->VMEM once (with
an 8-row halo) and every intermediate lives on-chip — the VPU stencil-fusion
pattern the reference approximates with chained cv::cuda filters
(src/Stabilizer.cpp:129-138).

Boundary handling: the caller reflect-101-pads the image by HALO rows and to
a 128-multiple width; in-tile shifts are plain rolls whose wrap-around lands
only in the discarded halo. Matches ops.features.min_eig_response to f32
rounding everywhere; the NMS peak mask matches on the interior (the 1-px rim
differs by border convention, which the min-distance stage discards anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
HALO = 8          # sublane-aligned; stencil reach is 3 rows
NEG = -3.0e38     # peak-compare fill outside the image


def _roll(x, dy, dx):
    """v[y, x] = src[y+dy, x+dx] via non-negative rolls (pltpu.roll rejects
    negative shifts; roll by size-shift instead)."""
    v = x
    if dy:
        v = pltpu.roll(v, (-dy) % v.shape[0], 0)
    if dx:
        v = pltpu.roll(v, (-dx) % v.shape[1], 1)
    return v


def _corner_kernel(img_hbm, resp_ref, peak_ref, scratch, sem, *,
                   scale: float, n_tiles: int):
    i = pl.program_id(0)
    base = pl.multiple_of(i * TILE_H, TILE_H)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(base, TILE_H + 2 * HALO), :], scratch, sem)
    copy.start()
    copy.wait()
    x = scratch[:]                                   # (TILE_H+2H, W)

    # Sobel dx/dy (scaled as cv::cornerMinEigenVal's u8 normalization).
    gx = (_roll(x, -1, 1) + 2.0 * _roll(x, 0, 1) + _roll(x, 1, 1)
          - _roll(x, -1, -1) - 2.0 * _roll(x, 0, -1) - _roll(x, 1, -1)) * scale
    gy = (_roll(x, 1, -1) + 2.0 * _roll(x, 1, 0) + _roll(x, 1, 1)
          - _roll(x, -1, -1) - 2.0 * _roll(x, -1, 0) - _roll(x, -1, 1)) * scale

    xx = gx * gx
    yy = gy * gy
    xy = gx * gy

    def boxsum(v):
        rows = _roll(v, -1, 0) + v + _roll(v, 1, 0)
        return _roll(rows, 0, -1) + rows + _roll(rows, 0, 1)

    sxx = boxsum(xx)
    syy = boxsum(yy)
    sxy = boxsum(xy)
    half_tr = 0.5 * (sxx + syy)
    half_df = 0.5 * (sxx - syy)
    resp = half_tr - jnp.sqrt(half_df * half_df + sxy * sxy)

    # 3x3 peak compare (neighbors filled with -inf at the padded rim — the
    # halo rows hold valid reflected data, so only the roll wrap-around at
    # the tile edges is wrong and those rows are discarded).
    neigh = jnp.full_like(resp, NEG)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            neigh = jnp.maximum(neigh, _roll(resp, dy, dx))
    peak = (resp >= neigh).astype(jnp.float32)

    resp_ref[:] = jax.lax.slice(
        resp, (HALO, 0), (HALO + TILE_H, resp.shape[1]))
    peak_ref[:] = jax.lax.slice(
        peak, (HALO, 0), (HALO + TILE_H, peak.shape[1]))


@functools.partial(jax.jit, static_argnames=("block_size", "aperture",
                                             "interpret"))
def corner_response(gray: jnp.ndarray, block_size: int = 3, aperture: int = 3,
                    interpret: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused min-eig response + 3x3 peak mask. gray: (H, W) f32 u8-domain."""
    assert block_size == 3 and aperture == 3, "fused kernel supports 3/3"
    scale = 1.0 / ((1 << (aperture - 1)) * block_size * 255.0)
    h, w = gray.shape
    n_tiles = pl.cdiv(h, TILE_H)
    ph = n_tiles * TILE_H
    pw = ((w + 127) // 128) * 128
    x = gray.astype(jnp.float32)
    # Reflect-101 pad: HALO rows top/bottom (+ tile rounding) and width to a
    # lane multiple. np-style 'reflect' == reflect-101.
    x = jnp.pad(x, ((HALO, HALO + (ph - h)), (0, pw - w)), mode="reflect")

    resp, peak = pl.pallas_call(
        functools.partial(_corner_kernel, scale=scale, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((TILE_H, pw), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE_H, pw), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((ph, pw), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((TILE_H + 2 * HALO, pw), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x)
    return resp[:h, :w], peak[:h, :w] > 0.0
