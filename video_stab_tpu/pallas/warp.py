"""Pallas TPU kernel: full-frame affine warp (the emit hot path).

Replaces the XLA ``warp_affine_tiled`` formulation (ops/warp.py) on TPU:
that one extracts per-tile slabs with vmapped dynamic slices, which XLA
lowers to slab gathers — measured 18.7 ms for a 1080p×3 warp on a v5e.

Layout: one grid step per (channel, output TILE). Per-tile slab origins
(data-dependent — they follow the inverse map) are computed vectorized in
XLA and fed in as scalar-prefetch arrays; the input ``pl.Element``
index_map aligns them to the (8, 128) memref tiling, the Pallas pipeline
streams each tile's (sh_a, sw_a) input rect with its own double-buffered
DMA, and the kernel body is just u8->i32 widen, two alignment-residual
rolls, and exact bilinear reconstruction as a static sum of hat-weighted
shifted views — the same math as ops/warp.py's tiled formulation at VPU
speed with zero HBM gathers and no strip-halo re-reads.

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
import os

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
# Round-4 sweep on real TPU (chained-carry timing, donated frames): the
# tile is now chosen STATICALLY per call from the envelope —
#   (64, 256): 1080p env3 0.49 ms (was 0.58), 4K env3 1.59 (was 2.08),
#              env6 0.55/1.81 (was 0.66/2.41); compiles up to env=14,
#              scoped-VMEM-OOMs at 15.
#   (64, 128): the wide-envelope fallback (chain runs max(12, aux) up to
#              15 deg); env15 0.80 ms.
# Threshold sin(13 deg) keeps a margin from the OOM cliff. Other shapes
# measured worse or OOM'd earlier: 32x128 (0.84), 32x256 (0.61),
# 128x128 (0.49 but env6 0.63 and OOM at 15), 128x256, 64x512.
TH, TW = 64, 128
TH_NARROW, TW_NARROW = 64, 256
_NARROW_SLOPE = math.sin(math.radians(13.0))


def _pick_tile(s_env: float) -> tuple[int, int]:
    """Static output-tile shape for a given envelope slope bound."""
    if s_env <= _NARROW_SLOPE:
        return TH_NARROW, TW_NARROW
    return TH, TW

# Tier-table envelope fractions (smallest-first; the full envelope is
# always appended). Tap MACs scale ~frac^2, so the ladder's granularity
# sets how much a mid-size rotation overpays: the fused chain holds a
# SUSTAINED horizon tilt (often 1-3 deg inside a 13-18 deg envelope),
# which with the coarse ladder landed on the env/4 table every frame —
# wide envelopes get extra rungs so the composed angle pays close to its
# own table.
TIER_FRACS = (0.0625, 0.25)
TIER_FRACS_WIDE = (0.0625, 0.125, 0.1875, 0.25, 0.375)

# Projective allowance |g|,|h| of warp_homography_u8's static envelope.
PROJ_BUDGET_DEFAULT = 5e-6


def _envelope_terms(max_angle_deg: float, th: int = TH,
                    tw: int = TW) -> tuple[int, int]:
    """Static shift-term counts for the (th, tw) tile under the rotation
    envelope (sin bounds the off-diagonals, 1-cos the diagonal deviation).
    Mirrors ops/warp.py:194-198.

    Sufficiency: base = floor(min over tile of (s - d)) computed from the
    SAME f32 values the weights use, so (q - d) in [0, range + 1) exactly,
    where range = max - min <= the analytic bound below. Bilinear needs
    integer taps 0 .. floor(max q-d) + 1 <= floor(range + 1) + 1
    <= ceil(range) + 2 terms."""
    s = abs(math.sin(math.radians(float(max_angle_deg))))
    return _terms_from_slope(s, th, tw)


def _terms_from_slope(s: float, th: int = TH, tw: int = TW) -> tuple[int, int]:
    ry = int(np.ceil(s * (tw - 1) + (s ** 2) * th)) + 2
    rx = int(np.ceil(s * (th - 1) + (s ** 2) * tw)) + 2
    return ry, rx


def _single_tier_forced() -> bool:
    """Escape hatch: VSTAB_WARP_SINGLE_TIER=1 forces the full-envelope
    single-tier kernel (no in-kernel pl.when tier branch) in both warp
    wrappers — byte-identical structure to the round-3 TPU-validated
    kernel. Effective at PROCESS START (the jit trace cache is keyed on
    static args only); bench.py re-execs itself with this set if the
    tier-cascade kernel fails Mosaic compile."""
    return os.environ.get("VSTAB_WARP_SINGLE_TIER", "") == "1"


def _warp_kernel(oy_ref, ox_ref, tier_ref, m_ref, img_ref, out_ref, *,
                 ntx: int, pad_y: int, halo_x: int,
                 tap_tables, th: int = TH, tw: int = TW,
                 projective: bool = False):
    """One grid step = ONE (channel, output tile).

    The per-tile slab origin is data-dependent (it follows the inverse
    map), so it is computed OUTSIDE the kernel — vectorized over all
    tiles in a handful of XLA ops — and fed in as scalar-prefetch arrays
    (oy/ox: the clamped per-tile slab origins in padded-image element
    coordinates). The input index_map aligns them down to the (8, 128)
    tile grid (provably, via the in-map division); the kernel re-derives
    the 0..7 / 0..127 residuals and cancels them with two rolls. The
    Pallas pipeline then streams each tile's (sh_a, sw_a) input rect with
    its own double-buffered DMA: no strip-halo re-reads, no in-kernel
    tile walk, no per-tile offset reductions — the body is just convert,
    two residual rolls, and the tap MACs. (The previous in-kernel fori
    walk spent ~0.64 us/tile on coords+sync+loop overhead — 2.5x the tap
    math.)

    img_ref: (1, sh_a, sw_a) u8 slab; out_ref: (1, TH, TW) u8;
    m_ref: (1, 8) f32 inverse map in SMEM (a b c d e f g h; g = h = 0 and
    projective=False for affine maps — the divide then compiles away).
    """
    a_ = m_ref[0, 0]
    b_ = m_ref[0, 1]
    c_ = m_ref[0, 2]
    d_ = m_ref[0, 3]
    e_ = m_ref[0, 4]
    f_ = m_ref[0, 5]
    g_ = m_ref[0, 6]
    h_ = m_ref[0, 7]

    t = pl.program_id(1)
    sh_a = img_ref.shape[1]
    sw_a = img_ref.shape[2]

    dy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    dx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    y0 = ((t // ntx) * th).astype(jnp.float32)
    x0 = ((t % ntx) * tw).astype(jnp.float32)
    sx = a_ * (x0 + dx) + b_ * (y0 + dy) + c_
    sy = d_ * (x0 + dx) + e_ * (y0 + dy) + f_
    if projective:
        wdn = g_ * (x0 + dx) + h_ * (y0 + dy) + 1.0
        inv = 1.0 / wdn
        sx = sx * inv
        sy = sy * inv

    resid_y = oy_ref[t] % 8
    resid_x = ox_ref[t] % 128
    # Mosaic has no direct u8<->f32 casts (hop through int32) and no i8
    # dynamic rotate — widen to i32, rotate the alignment residuals to
    # row/col 0 so the static taps index from the true base, and shrink
    # to the tap-reachable rows between the rolls (the f32 convert and
    # the lane roll then touch ~40% less data than rolling the full
    # aligned fetch).
    ry_max = max(tt[0] for tt in tap_tables)
    rx_max = max(tt[1] for tt in tap_tables)
    slab = img_ref[0].astype(jnp.int32)
    slab = pltpu.roll(slab, (sh_a - resid_y) % sh_a, 0)[:th + ry_max - 1]
    slab = pltpu.roll(slab, (sw_a - resid_x) % sw_a, 1)
    slab = slab[:, :tw + rx_max - 1].astype(jnp.float32)
    qy = sy - (oy_ref[t] - pad_y).astype(jnp.float32)
    qx = sx - (ox_ref[t] - halo_x).astype(jnp.float32)

    # The tap table is selected AT RUNTIME per call (per stream when the
    # caller is vmapped): tier_ref holds the index of the smallest table
    # the map provably fits (driver-side exact bound). pl.when on the
    # scalar is a real Mosaic branch, so one table's MACs execute — this
    # replaces the former lax.cond between whole pallas_calls, which a
    # vmapped caller lowered to running EVERY branch plus a select (the
    # reason multi-stream serving was pinned to the full-envelope table).
    def _accumulate(ry_terms, rx_terms):
        # Hoist the x-taps (shared across every ry term).
        # Straight-line accumulation: a per-ry runtime skip (pl.when
        # on max(wy)) measured 3.7x SLOWER — 34k vector-reduction
        # branches flush the VPU pipeline; predictable MACs win.
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(qx - (dx + rx)))
               for rx in range(rx_terms)]
        # Materialize each lane-shifted slab view once (lane shifts
        # cost more than sublane-offset slices; this turns ry*rx
        # lane shifts into rx).
        slabs_x = [slab[:, rx:rx + tw] for rx in range(rx_terms)]
        acc = jnp.zeros((th, tw), jnp.float32)
        for ry in range(ry_terms):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (dy + ry)))
            inner = jnp.zeros((th, tw), jnp.float32)
            for rx in range(rx_terms):
                inner = inner + wxs[rx] * slabs_x[rx][ry:ry + th]
            acc = acc + wy * inner

        # Round half-to-even (cv2 saturate_cast / jnp.round
        # semantics), so TPU and CPU dispatch of warp_affine_fast
        # agree bit-for-bit even on exact .5 bilinear ties
        # (reachable with rational weights).
        r = jnp.floor(acc + 0.5)
        tie_odd = ((r - acc) == 0.5) \
            & ((r * 0.5) != jnp.floor(r * 0.5))
        r = jnp.where(tie_odd, r - 1.0, r)
        out_ref[0] = jnp.clip(r, 0.0, 255.0).astype(
            jnp.int32).astype(jnp.uint8)

    if len(tap_tables) == 1:
        # Single tier: emit the straight-line body with NO runtime branch —
        # byte-identical kernel structure to the round-3 TPU-validated
        # full-envelope kernel (the VSTAB_WARP_SINGLE_TIER escape hatch and
        # branch="large" both land here).
        _accumulate(*tap_tables[0])
    else:
        tier = tier_ref[0]
        for ti, (ry_terms, rx_terms) in enumerate(tap_tables):

            @pl.when(tier == ti)
            def _(ry_terms=ry_terms, rx_terms=rx_terms):
                _accumulate(ry_terms, rx_terms)


def _warp_u8_impl(img, mvec8, out_h, out_w, border_mode, border_value,
                  s_env: float, max_shift: int,
                  tiers, projective: bool,
                  interpret: bool, th: int = TH, tw: int = TW):
    """Shared tile-kernel driver for affine and projective u8 warps.

    mvec8: (1, 8) f32 inverse map. s_env: static slope bound (the
    envelope) used for geometry + the full tap table. tiers: list of
    ((ry_terms, rx_terms), pred) smallest-first; pred is a traced
    sufficiency predicate (None = unconditional / final tier, whose
    terms must be the full-envelope table).
    """
    has_c = img.ndim == 3
    if not has_c:
        img = img[:, :, None]
    img = img.astype(jnp.uint8)
    h, w, ch = img.shape

    ry_l, rx_l = tiers[-1][0]
    sh_a = -(-(th + ry_l - 1 + 7) // 8) * 8
    sw_a = -(-(tw + rx_l - 1 + 127) // 128) * 128

    oh_a = -(-out_h // th) * th
    ow_a = -(-out_w // tw) * tw

    # Pads: translation budget + the envelope's coordinate deviation over
    # the FULL frame (sin term across the orthogonal extent + the cos-1 ~
    # s^2 diagonal deviation) + slab dims + slack, so every in-envelope
    # tile's clamped slab origin reads real (padded) content. The sin
    # term matters once the envelope is wide (the fused-roll chain runs
    # at warp_envelope + aux_rotation ~ 13 deg, where sin*w is hundreds
    # of px); omitting it from pad_y silently blacked out edge tiles.
    dev_y = int(np.ceil(s_env * (ow_a + 2 * max_shift)
                        + (s_env ** 2) * (oh_a + 2 * max_shift)))
    pad_y = max_shift + th + sh_a + 2 + dev_y
    hp = h + 2 * pad_y
    hp_pad_extra = (-hp) % 8
    halo_x = (max_shift
              + int(np.ceil(s_env * (oh_a + 2 * max_shift)
                            + (s_env ** 2) * (ow_a + 2 * max_shift)))
              + sw_a + 130)
    halo_x = -(-halo_x // 128) * 128
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

    # Per-tile slab origins, vectorized over all tiles at once (the
    # kernel's former in-loop reductions). The base is the floor of the
    # min residual (source minus local output coordinate) over the tile;
    # for the affine map that min sits at a tile corner, and a small
    # epsilon absorbs both the corner-vs-interior f32 rounding dip and
    # (for projective maps) the rational map's sub-pixel sag below its
    # corner chords — the +2 tap-count cushion proves one extra unit of
    # slack, so lowering the base by <1 keeps every tap in-table.
    nty = oh_a // th
    ntx = ow_a // tw
    hp_t = h + 2 * pad_y + hp_pad_extra
    wp_t = w + halo_x + pad_right
    mf = jnp.reshape(mvec8, (8,))
    yc = (jnp.arange(nty, dtype=jnp.float32) * th)[:, None, None, None] \
        + jnp.asarray([0.0, th - 1.0], jnp.float32)[None, None, :, None]
    xc = (jnp.arange(ntx, dtype=jnp.float32) * tw)[None, :, None, None] \
        + jnp.asarray([0.0, tw - 1.0], jnp.float32)[None, None, None, :]
    sxc = mf[0] * xc + mf[1] * yc + mf[2]
    syc = mf[3] * xc + mf[4] * yc + mf[5]
    if projective:
        wdn = mf[6] * xc + mf[7] * yc + 1.0
        inv = 1.0 / wdn
        sxc = sxc * inv
        syc = syc * inv
    eps = 0.51 if projective else 0.01
    resy = syc - jnp.asarray([0.0, th - 1.0],
                             jnp.float32)[None, None, :, None]
    resx = sxc - jnp.asarray([0.0, tw - 1.0],
                             jnp.float32)[None, None, None, :]
    base_y = jnp.floor(jnp.min(resy, axis=(2, 3)) - eps).astype(jnp.int32)
    base_x = jnp.floor(jnp.min(resx, axis=(2, 3)) - eps).astype(jnp.int32)
    oy = jnp.clip(base_y + pad_y, 0, hp_t - sh_a).reshape(-1)
    ox = jnp.clip(base_x + halo_x, 0, wp_t - sw_a).reshape(-1)

    # Tier id (smallest tap table whose exact sufficiency predicate
    # holds) — DATA, not control flow: the kernel branches on it per call
    # (pl.when on the prefetched scalar), so a vmapped caller gets
    # per-stream table selection instead of the every-branch+select a
    # batched lax.cond would lower to. All tables share one kernel and
    # one DMA geometry (sized by the full-envelope table).
    tap_tables = tuple(t for t, _pred in tiers)
    tid = jnp.full((1,), len(tiers) - 1, jnp.int32)
    for i in reversed(range(len(tiers) - 1)):
        tid = jnp.where(tiers[i][1], jnp.full((1,), i, jnp.int32), tid)

    kern = functools.partial(
        _warp_kernel, ntx=ntx, pad_y=pad_y, halo_x=halo_x,
        tap_tables=tap_tables, th=th, tw=tw, projective=projective)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ch, nty * ntx),
        in_specs=[
            pl.BlockSpec((1, 8), lambda c, t, oy, ox, td: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(sh_a), pl.Element(sw_a)),
                lambda c, t, oy, ox, td: (
                    c,
                    pl.multiple_of((oy[t] // 8) * 8, 8),
                    pl.multiple_of((ox[t] // 128) * 128, 128)),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw),
                               lambda c, t, oy, ox, td: (
                                   c, t // ntx, t % ntx),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ch, oh_a, ow_a), jnp.uint8),
        interpret=interpret,
    )(oy, ox, tid, mvec8, imgp)
    out = jnp.transpose(out, (1, 2, 0))[:out_h, :out_w]
    return out if has_c else out[:, :, 0]


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
    saturate_cast rounding). branch="large" compiles a single
    full-envelope kernel (for vmapped callers, where a batched-predicate
    lax.cond runs both branches).
    """
    out_h = out_h if out_h is not None else img.shape[0]
    out_w = out_w if out_w is not None else img.shape[1]
    minv = m if inverse_map else invert_affine(m)
    mf6 = jnp.reshape(minv.astype(jnp.float32), (6,))
    mvec8 = jnp.concatenate([mf6, jnp.zeros(2, jnp.float32)]).reshape(1, 8)

    s_env = abs(math.sin(math.radians(float(max_angle_deg))))
    th, tw = _pick_tile(s_env)
    terms_l = _envelope_terms(max_angle_deg, th, tw)
    # Small-rotation tier cascade: most stabilizing corrections sit far
    # inside the envelope (<= 1/4 of it), where the tap table shrinks ~3x
    # (e.g. 9x4 -> 4x3 at the default 3 deg); wide envelopes (fused-chain
    # roll, 15 deg) additionally get a 1/16 tier so a ~1 deg composed
    # rotation pays a small table. Tier selection uses an EXACT per-map
    # bound, so every tier computes exact bilinear.
    if branch == "large" or _single_tier_forced():
        tiers = [(terms_l, None)]
    else:
        # Exact per-map coordinate ranges over a (TH, TW) tile — the same
        # quantities _envelope_terms bounds analytically. A tier is
        # sufficient iff ceil(range) + 2 <= terms, i.e. range <= terms-2.
        ry_act = jnp.abs(mf6[3]) * (tw - 1) + jnp.abs(mf6[4] - 1.0) * th
        rx_act = jnp.abs(mf6[1]) * (th - 1) + jnp.abs(mf6[0] - 1.0) * tw
        # env/16 included at every envelope: steady-state stabilizer
        # corrections are ~0.05-0.2 deg, inside the 3x3-tap table.
        fracs = TIER_FRACS if max_angle_deg <= 8.0 else TIER_FRACS_WIDE
        tiers = []
        for f in fracs:
            t = _envelope_terms(max_angle_deg * f, th, tw)
            if t == terms_l or any(t == p[0] for p in tiers):
                continue
            pred = (ry_act <= float(t[0] - 2)) & (rx_act <= float(t[1] - 2))
            tiers.append((t, pred))
        tiers.append((terms_l, None))
    return _warp_u8_impl(img, mvec8, out_h, out_w, border_mode,
                         border_value, s_env, max_shift, tiers,
                         projective=False, interpret=interpret,
                         th=th, tw=tw)


@functools.partial(jax.jit, static_argnames=(
    "out_h", "out_w", "border_mode", "border_value", "inverse_map",
    "max_angle_deg", "max_shift", "proj_budget", "branch", "interpret"))
def warp_homography_u8(img: jnp.ndarray, h_mat: jnp.ndarray,
                       out_h: int | None = None, out_w: int | None = None,
                       border_mode: int = BORDER_CONSTANT,
                       border_value: float = 0.0,
                       inverse_map: bool = False,
                       max_angle_deg: float = 6.0,
                       max_shift: int = 128,
                       proj_budget: float = PROJ_BUDGET_DEFAULT,
                       branch: str = "auto",
                       interpret: bool = False) -> jnp.ndarray:
    """Pallas full-frame PROJECTIVE warp, u8 HWC in -> u8 HWC out.

    The same strip/tile machinery as the affine kernel with a per-pixel
    perspective divide — replacing the XLA gather warp_perspective on the
    homography emit path (~19 ms at 1080p x3 -> strip-kernel speed).

    Envelope: |rotation/shear slopes| <= sin(max_angle_deg) plus a
    projective allowance |g|,|h| <= proj_budget. The budget enters the
    STATIC kernel geometry as an extra slope allowance 2*proj_budget*dim,
    so it must stay small: the 5e-6 default admits perspective that bends
    coordinates by ~proj_budget*dim^2 ~ 20 px across a 1080p frame (far
    beyond any stabilizing correction, which is exp of a smoothed
    log-residual) while adding only ~0.02 slope — a 1e-4 budget inflates
    halos/tap tables ~6x and VMEM-OOMs the strip kernel at 1080p.
    Out-of-envelope maps degrade (clamp), exactly like the affine
    contract. The small/large branch is picked by runtime DERIVATIVE
    bounds of the rational map.
    """
    out_h = out_h if out_h is not None else img.shape[0]
    out_w = out_w if out_w is not None else img.shape[1]
    hm = h_mat.astype(jnp.float32).reshape(3, 3)
    hinv = hm if inverse_map else jnp.linalg.inv(hm)
    hinv = hinv / hinv[2, 2]
    mvec8 = jnp.stack([hinv[0, 0], hinv[0, 1], hinv[0, 2],
                       hinv[1, 0], hinv[1, 1], hinv[1, 2],
                       hinv[2, 0], hinv[2, 1]]).reshape(1, 8)

    # Effective slope bound: rotation envelope + what the projective
    # budget can add to any first derivative over the output domain.
    dim = max(out_h, out_w) + max_shift
    s_env = abs(math.sin(math.radians(float(max_angle_deg)))) \
        + 2.0 * float(proj_budget) * dim
    th, tw = _pick_tile(s_env)
    terms_l = _terms_from_slope(s_env, th, tw)
    if branch == "large" or _single_tier_forced():
        tiers = [(terms_l, None)]
    else:
        # Runtime derivative bounds of the rational map over the output
        # domain: d(sy)/dx = (d - sy*g)/w etc., |sy| <= out_h + max_shift,
        # |w - 1| <= |g|*out_w + |h|*out_h.
        mf = jnp.reshape(mvec8, (8,))
        sx_max = float(out_w + max_shift)
        sy_max = float(out_h + max_shift)
        pb = jnp.abs(mf[6]) * out_w + jnp.abs(mf[7]) * out_h
        denom_lo = jnp.maximum(1.0 - pb, 1e-3)
        dsy_dx = (jnp.abs(mf[3]) + sy_max * jnp.abs(mf[6])) / denom_lo
        dsy_dy = (jnp.abs(mf[4] - 1.0) + sy_max * jnp.abs(mf[7]) + pb) \
            / denom_lo
        dsx_dy = (jnp.abs(mf[1]) + sx_max * jnp.abs(mf[7])) / denom_lo
        dsx_dx = (jnp.abs(mf[0] - 1.0) + sx_max * jnp.abs(mf[6]) + pb) \
            / denom_lo
        ry_act = dsy_dx * (tw - 1) + dsy_dy * th
        rx_act = dsx_dy * (th - 1) + dsx_dx * tw
        fracs = (0.0625, 0.25) if max_angle_deg > 6.0 else (0.25,)
        tiers = []
        for f in fracs:
            s_t = abs(math.sin(math.radians(float(max_angle_deg * f)))) \
                + 2.0 * f * float(proj_budget) * dim
            t = _terms_from_slope(s_t, th, tw)
            if t == terms_l or any(t == p[0] for p in tiers):
                continue
            pred = (pb < 0.5) & (ry_act <= float(t[0] - 2)) \
                & (rx_act <= float(t[1] - 2))
            tiers.append((t, pred))
        tiers.append((terms_l, None))
    return _warp_u8_impl(img, mvec8, out_h, out_w, border_mode,
                         border_value, s_env, max_shift, tiers,
                         projective=True, interpret=interpret,
                         th=th, tw=tw)
