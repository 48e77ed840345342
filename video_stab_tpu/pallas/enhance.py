"""Fused elementwise enhancement Pallas kernel.

The Enhancer's pointwise stages (white-balance scale, contrast/brightness,
gamma) applied in ONE pass over row tiles — each pixel is read from HBM
once and written once, with all arithmetic in VMEM (the reference pays a
full frame read+write per stage through cv::cuda convertTo / LUT,
src/Enhancer.cpp:190-239). Global white-balance means are reduced by XLA
beforehand and enter as scalars.

Layout note: the frame is viewed as (H, W*3) — interleaved BGR flattened
into the lane axis. A trailing dim of 3 would be padded to 128 lanes by the
TPU tiler (42x memory blow-up); the flat view is free (same bytes) and the
per-channel white-balance scale becomes a lane-iota%3 select.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128


def _enhance_kernel(scales_ref, img_ref, out_ref, *, contrast: float,
                    brightness: float, gamma: float):
    x = img_ref[:]                       # (TILE_H, W*3) interleaved BGR
    s0 = scales_ref[0, 0]
    s1 = scales_ref[0, 1]
    s2 = scales_ref[0, 2]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 3
    wb = jnp.where(lane == 0, s0, jnp.where(lane == 1, s1, s2))
    x = x * wb
    if contrast != 1.0 or brightness != 0.0:
        x = jnp.clip(x * contrast + brightness, 0.0, 255.0)
    if abs(gamma - 1.0) > 1e-3:
        x = jnp.power(jnp.clip(x, 0.0, 255.0) * (1.0 / 255.0), gamma) * 255.0
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("contrast", "brightness",
                                             "gamma", "enable_white_balance",
                                             "wb_strength", "interpret"))
def enhance_pointwise(img: jnp.ndarray, contrast: float = 1.0,
                      brightness: float = 0.0, gamma: float = 1.0,
                      enable_white_balance: bool = False,
                      wb_strength: float = 1.0,
                      interpret: bool = False) -> jnp.ndarray:
    """img: (H, W, 3) f32 u8-domain BGR -> enhanced, same shape/dtype."""
    h, w, _ = img.shape
    if enable_white_balance:
        means = jnp.mean(img, axis=(0, 1))
        gray = jnp.mean(means)
        scales = 1.0 + wb_strength * (gray / (means + 1e-6) - 1.0)
    else:
        scales = jnp.ones((3,), jnp.float32)
    scales = scales.reshape(1, 3).astype(jnp.float32)

    n_tiles = pl.cdiv(h, TILE_H)
    ph = n_tiles * TILE_H
    flat = img.astype(jnp.float32).reshape(h, w * 3)
    if ph != h:
        flat = jnp.pad(flat, ((0, ph - h), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_enhance_kernel, contrast=contrast,
                          brightness=brightness, gamma=gamma),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, w * 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, w * 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ph, w * 3), jnp.float32),
        interpret=interpret,
    )(scales, flat)
    return out[:h].reshape(h, w, 3)
