"""Pallas TPU kernel: full-frame affine warp (the emit hot path).

Replaces the XLA ``warp_affine_tiled`` formulation (ops/warp.py) on TPU:
that one extracts per-tile slabs with vmapped dynamic slices, which XLA
lowers to slab gathers — measured 18.7 ms for a 1080p×3 warp on a v5e.

Layout: the padded u8 source is processed as overlapping FULL-HEIGHT COLUMN
STRIPS (``pl.Element`` block indexing), one grid step per (channel, strip).
A strip plus its halo is a few MB of the ~16 MB VMEM budget at any
resolution up to 4K — the halo covers the rotation envelope's x-deviation
across the full image height (|sin| * H) plus the translation budget. The
kernel walks (8, 128) output tiles inside the strip: one aligned in-VMEM
dynamic slice each (+ dynamic roll for the alignment residual), then exact
bilinear reconstruction as a static sum of hat-weighted shifted views —
the same math as ops/warp.py:153-255 at VPU speed with zero HBM gathers.

u8 in / u8 out by design: the reference's whole pipeline operates on CV_8U
mats (cv::warpAffine on 8U, src/Stabilizer.cpp:1024-1060), so integer
quantization at the warp boundary is reference-faithful, and u8 strips are
what keep the VMEM working set small.

Envelope contract (same as ops/warp.py): |rotation| <= max_angle_deg,
translation <= max_shift px. Stabilizer corrections sit far inside it;
beyond it the sample clamps to the envelope pad (degraded, not unsafe).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_stab_tpu.ops.warp import (BORDER_CONSTANT, _pad_mode,
                                     invert_affine)

# Output tile (TH, TW). Tap counts scale as (|sin|*TW + 1) x (|sin|*TH + 1),
# per-tile slice/roll/convert overhead scales as 1/(TH*TW). Measured at
# 1080p x3 (small-rotation branch): TH=8 -> 4.3 ms, TH=32 -> 0.94 ms,
# TH=64 keeps the SAME small-branch tap table (4x3) with half the tiles.
TH, TW = 64, 128
STRIP_W = 512           # output columns per grid step


def _envelope_terms(max_angle_deg: float) -> tuple[int, int]:
    """Static shift-term counts for the (TH, TW) tile under the rotation
    envelope (sin bounds the off-diagonals, 1-cos the diagonal deviation).
    Mirrors ops/warp.py:194-198.

    Sufficiency: base = floor(min over tile of (s - d)) computed from the
    SAME f32 values the weights use, so (q - d) in [0, range + 1) exactly,
    where range = max - min <= the analytic bound below. Bilinear needs
    integer taps 0 .. floor(max q-d) + 1 <= floor(range + 1) + 1
    <= ceil(range) + 2 terms."""
    s = abs(math.sin(math.radians(float(max_angle_deg))))
    ry = int(np.ceil(s * (TW - 1) + (s ** 2) * TH)) + 2
    rx = int(np.ceil(s * (TH - 1) + (s ** 2) * TW)) + 2
    return ry, rx


def _warp_kernel(m_ref, img_ref, out_ref, *, out_h: int,
                 pad_y: int, halo_x: int, strip_in_w: int,
                 ry_terms: int, rx_terms: int, sh_a: int, sw_a: int):
    """One grid step = one (channel, column strip).

    img_ref: (1, Hp, strip_in_w) u8 — the strip plus halo_x on each side,
    already offset so in-strip x index = out_x - strip_x0 + halo_x.
    out_ref: (1, out_h, STRIP_W) u8. m_ref: (1, 6) f32 inverse map in SMEM.
    """
    a_ = m_ref[0, 0]
    b_ = m_ref[0, 1]
    c_ = m_ref[0, 2]
    d_ = m_ref[0, 3]
    e_ = m_ref[0, 4]
    f_ = m_ref[0, 5]

    strip = pl.program_id(1)
    strip_x0 = (strip * STRIP_W).astype(jnp.float32)

    nty = out_h // TH
    ntx = STRIP_W // TW

    dy = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(jnp.float32)
    dx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(jnp.float32)

    def tile_body(idx, _):
        ty = idx // ntx
        tx = idx % ntx
        y0 = (ty * TH).astype(jnp.float32)
        x0 = strip_x0 + (tx * TW).astype(jnp.float32)
        sx = a_ * (x0 + dx) + b_ * (y0 + dy) + c_
        sy = d_ * (x0 + dx) + e_ * (y0 + dy) + f_
        # Base = floor of the min residual (source minus local output
        # coordinate); invariant: qy - dy in [0, ry_terms) for in-envelope
        # maps (ops/warp.py:226-233).
        base_y = jnp.floor(jnp.min(sy - dy)).astype(jnp.int32)
        base_x = jnp.floor(jnp.min(sx - dx)).astype(jnp.int32)
        # Slice starts within this strip's VMEM block; clamp to stay
        # in-bounds (out-of-envelope maps degrade, never read OOB).
        start_y = jnp.clip(base_y + pad_y, 0, img_ref.shape[1] - sh_a)
        start_x = jnp.clip(
            base_x - (strip * STRIP_W) + halo_x, 0, strip_in_w - sw_a)
        sy_al = pl.multiple_of((start_y // 8) * 8, 8)
        sx_al = pl.multiple_of((start_x // 128) * 128, 128)
        # Mosaic has no direct u8<->f32 casts (hop through int32) and no
        # i8 dynamic rotate — convert first, then rotate the alignment
        # residual to row/col 0 so the static taps index from the true base.
        slab = img_ref[0, pl.ds(sy_al, sh_a), pl.ds(sx_al, sw_a)
                       ].astype(jnp.int32).astype(jnp.float32)
        slab = pltpu.roll(slab, (sh_a - (start_y - sy_al)) % sh_a, 0)
        slab = pltpu.roll(slab, (sw_a - (start_x - sx_al)) % sw_a, 1)
        qy = sy - (start_y - pad_y).astype(jnp.float32)
        qx = sx - (start_x - halo_x + strip * STRIP_W).astype(jnp.float32)
        # Hoist the x-taps (shared across every ry term). Straight-line
        # accumulation: a per-ry runtime skip (pl.when on max(wy)) measured
        # 3.7x SLOWER — 34k vector-reduction branches flush the VPU
        # pipeline; predictable MACs win.
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(qx - (dx + rx)))
               for rx in range(rx_terms)]
        acc = jnp.zeros((TH, TW), jnp.float32)
        for ry in range(ry_terms):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (dy + ry)))
            inner = jnp.zeros((TH, TW), jnp.float32)
            for rx in range(rx_terms):
                inner = inner + wxs[rx] * slab[ry:ry + TH, rx:rx + TW]
            acc = acc + wy * inner

        # Round half-to-even (cv2 saturate_cast / jnp.round semantics), so
        # TPU and CPU dispatch of warp_affine_fast agree bit-for-bit even
        # on exact .5 bilinear ties (reachable with rational weights).
        r = jnp.floor(acc + 0.5)
        tie_odd = ((r - acc) == 0.5) & ((r * 0.5) != jnp.floor(r * 0.5))
        r = jnp.where(tie_odd, r - 1.0, r)
        out_ref[0, pl.ds(ty * TH, TH), pl.ds(tx * TW, TW)] = (
            jnp.clip(r, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8))
        return ()

    jax.lax.fori_loop(0, nty * ntx, tile_body, (), unroll=False)


@functools.partial(jax.jit, static_argnames=(
    "out_h", "out_w", "border_mode", "border_value", "inverse_map",
    "max_angle_deg", "max_shift", "branch", "interpret"))
def warp_affine_u8(img: jnp.ndarray, m: jnp.ndarray,
                   out_h: int | None = None, out_w: int | None = None,
                   border_mode: int = BORDER_CONSTANT,
                   border_value: float = 0.0,
                   inverse_map: bool = False,
                   max_angle_deg: float = 6.0,
                   max_shift: int = 128,
                   branch: str = "auto",
                   interpret: bool = False) -> jnp.ndarray:
    """Pallas full-frame affine warp, u8 HWC in -> u8 HWC out.

    Drop-in for ``warp_affine_tiled(img_f32, m).astype(u8)`` within the
    envelope; cv2 semantics (dst(x,y) = src(M^-1 (x,y)), bilinear,
    saturate_cast rounding).
    """
    out_h = out_h if out_h is not None else img.shape[0]
    out_w = out_w if out_w is not None else img.shape[1]
    minv = m if inverse_map else invert_affine(m)
    mvec = jnp.reshape(minv.astype(jnp.float32), (1, 6))

    has_c = img.ndim == 3
    if not has_c:
        img = img[:, :, None]
    img = img.astype(jnp.uint8)
    h, w, ch = img.shape

    s_env = abs(math.sin(math.radians(float(max_angle_deg))))
    ry_l, rx_l = _envelope_terms(max_angle_deg)
    # Small-rotation fast branch: most stabilizing corrections sit far
    # inside the envelope (<= 1/4 of it), where the tap table shrinks ~3x
    # (e.g. 9x4 -> 4x3 at the default 3 deg). Selected at runtime by an
    # EXACT per-map bound, so every map still gets exact bilinear.
    ry_s, rx_s = _envelope_terms(max_angle_deg * 0.25)
    sh_a = -(-(TH + ry_l - 1 + 7) // 8) * 8
    sw_a = -(-(TW + rx_l - 1 + 127) // 128) * 128

    oh_a = -(-out_h // TH) * TH
    ow_a = -(-out_w // STRIP_W) * STRIP_W
    n_strips = ow_a // STRIP_W

    # Vertical pad: translation budget + tile overhang + aligned-slice slack.
    pad_y = max_shift + TH + sh_a + 2
    hp = h + 2 * pad_y
    hp_pad_extra = (-hp) % 8
    # Horizontal halo: translation budget + the envelope's x-deviation over
    # the full height + slice width + alignment slack. The strip's VMEM
    # block is [strip_x0 - halo_x, strip_x0 + STRIP_W + halo_x) in source
    # coordinates, materialized by padding the image by exactly halo_x so
    # every strip's Element offset (strip * STRIP_W) is in range.
    halo_x = (max_shift + int(np.ceil(s_env * (oh_a + 2 * max_shift)))
              + sw_a + 130)
    halo_x = -(-halo_x // 128) * 128
    strip_in_w = STRIP_W + 2 * halo_x
    # Right pad additionally covers the output width overhang (ow_a > w).
    pad_right = halo_x + (ow_a - w) + (-(w + 2 * halo_x + (ow_a - w)) % 128)

    widths = ((pad_y, pad_y + hp_pad_extra), (halo_x, pad_right), (0, 0))
    if border_mode == BORDER_CONSTANT:
        imgp = jnp.pad(img, widths,
                       constant_values=np.uint8(np.clip(border_value, 0,
                                                        255)))
    else:
        imgp = jnp.pad(img, widths, mode=_pad_mode(border_mode))
    imgp = jnp.transpose(imgp, (2, 0, 1))       # planar (C, Hp, Wp)

    def run(imgp, ry_terms, rx_terms):
        # Slab dims from the LARGE branch: both branches then share
        # identical slice/roll geometry and differ only in tap count.
        kern = functools.partial(
            _warp_kernel, out_h=oh_a, pad_y=pad_y, halo_x=halo_x,
            strip_in_w=strip_in_w, ry_terms=ry_terms, rx_terms=rx_terms,
            sh_a=sh_a, sw_a=sw_a)
        return pl.pallas_call(
            kern,
            grid=(ch, n_strips),
            in_specs=[
                pl.BlockSpec((1, 6), lambda c, s: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(imgp.shape[1]),
                     pl.Element(strip_in_w)),
                    lambda c, s: (c, 0, s * STRIP_W),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, oh_a, STRIP_W),
                                   lambda c, s: (c, 0, s),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ch, oh_a, ow_a), jnp.uint8),
            interpret=interpret,
        )(mvec, imgp)

    # branch="large": single full-envelope kernel, no lax.cond — for
    # VMAPPED callers (batched multi-stream serving), where vmap lowers
    # cond-with-batched-predicate to run-both-branches + select, doubling
    # the warp cost. "auto" is right for unbatched streaming.
    if branch == "large" or (ry_s, rx_s) == (ry_l, rx_l):
        out = run(imgp, ry_l, rx_l)
    else:
        # Exact per-map coordinate ranges over a (TH, TW) tile — the same
        # quantities _envelope_terms bounds analytically. The small branch
        # is sufficient iff ceil(range) + 2 <= terms, i.e. range <= terms-2.
        mf = jnp.reshape(mvec, (6,))
        ry_act = jnp.abs(mf[3]) * (TW - 1) + jnp.abs(mf[4] - 1.0) * TH
        rx_act = jnp.abs(mf[1]) * (TH - 1) + jnp.abs(mf[0] - 1.0) * TW
        small_ok = (ry_act <= float(ry_s - 2)) & (rx_act <= float(rx_s - 2))
        out = jax.lax.cond(
            small_ok,
            lambda im: run(im, ry_s, rx_s),
            lambda im: run(im, ry_l, rx_l),
            imgp)
    out = jnp.transpose(out, (1, 2, 0))[:out_h, :out_w]
    return out if has_c else out[:, :, 0]
