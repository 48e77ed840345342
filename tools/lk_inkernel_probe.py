"""Probe: in-kernel LK with ALIGNED slab loads + per-point dynamic rolls.

The round-3 dead end (DESIGN.md 5d-quater (a)) was per-point windows at
ARBITRARY offsets: Mosaic requires 8/128-aligned dynamic vector loads
from VMEM. This probe gates the workaround the warp kernel already uses
for its residual shifts — load each point's slab at an 8/128-ALIGNED
origin (always legal, proven via pl.multiple_of), roll it once so the
point's integer position lands at a fixed (row, lane) anchor, then run
EVERY Newton-style iteration as fully vectorized math over the
VMEM-resident (N, 32, 128) slab stack with per-point hat weights built
from broadcasted iotas.

Mosaic layout rules learned compiling this (kept for the real kernel):
  - scalars cannot be stored to VMEM refs — write (1, 1) blocks;
  - tpu.iota is integer-only — build int32, cast to f32;
  - dynamic-slice origins need `pl.multiple_of(..., 8/128)` AFTER the
    clip (clip erases the provable alignment);
  - a (N,) or (N, 1) vector cannot be relayouted to (N, 1, 1) in-kernel
    (batch-dim transpose): per-point scalars used by vector math must
    ENTER the kernel pre-shaped (N, 1, 1); integer per-point scalars
    used for addressing enter via SMEM.

Why it could beat the shipped XLA LK: the XLA path is DISPATCH-bound
(~1-3 us fixed cost per op in scan/while bodies, tools/lk_op_probe.py;
~300 sequential ops per frame ~= 0.9 of LK's 1.03 ms). In-kernel, the
whole iteration ladder is one pallas call; per-iteration cost is pure
VPU math on resident data.

Measures, separately:
  - load+roll phase (N aligned loads + N dynamic rolls, once per level)
  - iteration phase (ITERS fully vectorized weighted-reduction steps)

Run:  timeout 1800 python tools/lk_inkernel_probe.py [interpret]
Gate: iteration phase must come in well under the XLA equivalent
      (~10 ops x ~3 us = ~30 us per 5-step trip) for the real kernel to
      be worth building.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_stab_tpu.utils.cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  compilation_cache_dir(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 200          # max_corners
ITERS = 30       # total Newton steps across rounds at one level
WIN = 15
H, W = 544, 960  # analysis plane (540 rounded up to sublane multiple)
SLAB_R, SLAB_C = 32, 128
ANCHOR_Y, ANCHOR_X = 8, 8    # point's integer pos after the roll


def kernel_noroll(img_ref, ipts_ref, fy_ref, fx_ref, out_ref, slab_scr, *,
                  iters):
    """No-roll variant: store the raw ALIGNED (32, 256) slab untouched and
    fold the residual offset (ry, rx) into the hat-weight anchor instead —
    fy/fx arrive as frac + residual, precomputed OUTSIDE the kernel. The
    iteration math is identical; only the weight support moves. Measures
    whether pltpu.roll is the load phase's real cost."""

    def load_one(p, _):
        iy = ipts_ref[0, p]
        ix = ipts_ref[1, p]
        oy = pl.multiple_of(
            jnp.clip((iy - ANCHOR_Y) // 8, 0, (H - SLAB_R) // 8) * 8, 8)
        ox = pl.multiple_of(
            jnp.clip((ix - ANCHOR_X) // 128, 0,
                     (W - 2 * SLAB_C) // 128) * 128, 128)
        slab_scr[p] = img_ref[pl.ds(oy, SLAB_R), pl.ds(ox, 2 * SLAB_C)]
        return 0

    jax.lax.fori_loop(0, N, load_one, 0)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, SLAB_R, 1), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 2 * SLAB_C), 2).astype(jnp.float32)

    def step_reduce(it, carry):
        jitter = carry * 1e-9
        gy = fy_ref[:] + jitter                          # (N, 1, 1)
        gx = fx_ref[:] + jitter
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rows - (gy + ANCHOR_Y)))
        wy = wy * (rows >= gy) * (rows < gy + WIN + 2)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cols - (gx + ANCHOR_X)))
        wx = wx * (cols >= gx) * (cols < gx + WIN + 2)
        slab = slab_scr[:]                               # (N, 32, 256)
        bx = jnp.sum(slab * wy)
        by = jnp.sum(slab * wx)
        bxy = jnp.sum(slab * wy * wx)
        return carry + bx * 1e-9 + by * 1e-9 + bxy * 1e-9

    acc = jax.lax.fori_loop(0, iters, step_reduce, jnp.float32(0.0))
    out_ref[0:1, 0:1] = acc[None, None]


def kernel(img_ref, ipts_ref, fy_ref, fx_ref, out_ref, slab_scr, *, iters):
    """ipts_ref: (2, N) int32 in SMEM (iy, ix). fy/fx: (N, 1, 1) f32 in
    VMEM — fractional parts pre-shaped OUTSIDE the kernel (Mosaic cannot
    relayout (N,) -> (N, 1, 1) in-kernel)."""

    # ---- phase 1: aligned load + per-point roll --------------------------
    def load_one(p, _):
        iy = ipts_ref[0, p]
        ix = ipts_ref[1, p]
        # Aligned origin: the greatest (8, 128) corner such that the
        # anchor-relative window stays inside the slab. pl.multiple_of
        # restores the provable alignment the clip erases.
        oy = pl.multiple_of(
            jnp.clip((iy - ANCHOR_Y) // 8, 0, (H - SLAB_R) // 8) * 8, 8)
        ox = pl.multiple_of(
            jnp.clip((ix - ANCHOR_X) // 128, 0,
                     (W - 2 * SLAB_C) // 128) * 128, 128)
        raw = img_ref[pl.ds(oy, SLAB_R), pl.ds(ox, 2 * SLAB_C)]
        # Roll so the point's integer position sits at (ANCHOR_Y, ANCHOR_X):
        # residual offsets are in [0, 8) rows / [0, 128) lanes by
        # construction, so a left-roll repositions without wraparound
        # touching the kept region.
        ry = iy - oy - ANCHOR_Y          # [0, 8)   after clip, typical
        rx = ix - ox - ANCHOR_X          # [0, 128)
        rolled = pltpu.roll(raw, -rx, 1)
        rolled = pltpu.roll(rolled, -ry, 0)
        slab_scr[p] = rolled[:, :SLAB_C]
        return 0

    jax.lax.fori_loop(0, N, load_one, 0)

    # ---- phase 2: vectorized iteration ladder ---------------------------
    # Mosaic's tpu.iota is integer-only — build int32 and cast.
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, SLAB_R, 1), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, SLAB_C), 2).astype(jnp.float32)

    def step_reduce(it, carry):
        """Pure weighted reductions (VPU-only lower bound). Two masked
        (N, 32, 128) elementwise products + full reductions per step —
        the cost shape of the shipped Newton step's residual moments
        b = sum (J - I) * gradI, without the dimension-dropping slices
        Mosaic cannot relayout."""
        jitter = carry * 1e-9
        gy = fy_ref[:] + jitter                          # (N, 1, 1)
        gx = fx_ref[:] + jitter
        # Hat weights with support [anchor, anchor+WIN+1): the bilinear
        # interpolation AND the window extent in one weight vector —
        # matches the shipped one-hot-matmul structure (ops/lk.py newton).
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rows - (gy + ANCHOR_Y)))
        wy = wy * (rows >= ANCHOR_Y) * (rows < ANCHOR_Y + WIN + 1)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cols - (gx + ANCHOR_X)))
        wx = wx * (cols >= ANCHOR_X) * (cols < ANCHOR_X + WIN + 1)
        slab = slab_scr[:]                               # (N, 32, 128)
        bx = jnp.sum(slab * wy)                          # full reduce
        by = jnp.sum(slab * wx)
        bxy = jnp.sum(slab * wy * wx)                    # bilinear moment
        return carry + bx * 1e-9 + by * 1e-9 + bxy * 1e-9

    acc = jax.lax.fori_loop(0, iters, step_reduce, jnp.float32(0.0))
    # Mosaic cannot store SCALARS to VMEM refs — write a (1, 1) block.
    out_ref[0:1, 0:1] = acc[None, None]


interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((H, W), np.float32))
pts_np = np.stack(
    [rng.uniform(20, H - 60, N), rng.uniform(20, W - 180, N)],
    axis=1).astype(np.float32)
pts = jnp.asarray(pts_np)


def build(iters, noroll=False):
    import functools
    return pl.pallas_call(
        functools.partial(kernel_noroll if noroll else kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (N, SLAB_R, 2 * SLAB_C if noroll else SLAB_C), jnp.float32)],
        interpret=interpret,
    )


def prep(pts):
    """Host-side split: integer coords for SMEM addressing, fractional
    parts pre-shaped (N, 1, 1) for in-kernel vector math."""
    ipts = jnp.floor(pts).astype(jnp.int32).T          # (2, N)
    frac = pts - jnp.floor(pts)
    return ipts, frac[:, 0].reshape(N, 1, 1), frac[:, 1].reshape(N, 1, 1)


@jax.jit
def run(img, pts):
    ipts, fy, fx = prep(pts)
    return build(ITERS)(img, ipts, fy, fx)


def timed(fn, reps):
    r = fn(img, pts)
    r.block_until_ready()
    p = pts
    t0 = time.perf_counter()
    for _ in range(reps):
        # Chain reps through a data dependence (TIMING RULE,
        # warp_tile_probe.py): independent repeats overlap on this
        # runtime and under-measure by large factors.
        r = fn(img, p)
        p = p + 0.0 * r[0, 0]
    r.block_until_ready()
    return (time.perf_counter() - t0) / reps, float(r[0, 0])


t0 = time.perf_counter()
r = run(img, pts)
r.block_until_ready()
print(f"compile+first: {time.perf_counter() - t0:.1f}s  "
      f"result={float(r[0, 0]):.6f}")

reps = 3 if interpret else 200
dt, _ = timed(run, reps)
print(f"full (load + {ITERS} iters): {dt * 1e3:.3f} ms")

# Split: a 0-iteration build isolates the load+roll phase.


@jax.jit
def run0(img, pts):
    ipts, fy, fx = prep(pts)
    return build(0)(img, ipts, fy, fx)


dt0, _ = timed(run0, reps)
per_iter = (dt - dt0) / ITERS
print(f"load+roll phase: {dt0 * 1e3:.3f} ms "
      f"({dt0 / N * 1e6:.2f} us/point)")
print(f"iteration phase: {(dt - dt0) * 1e3:.3f} ms total, "
      f"{per_iter * 1e6:.2f} us/step (XLA dispatch equivalent ~6 us/step "
      f"at 5 fused steps per ~30 us trip)")


# ---- no-roll variant: residual offsets folded into the weight anchor ----
@jax.jit
def run_nr(img, pts):
    ipts, fy, fx = prep(pts)
    return build(ITERS, noroll=True)(img, ipts, fy, fx)


@jax.jit
def run_nr0(img, pts):
    ipts, fy, fx = prep(pts)
    return build(0, noroll=True)(img, ipts, fy, fx)


dtn, _ = timed(run_nr, reps)
dtn0, _ = timed(run_nr0, reps)
print(f"NOROLL full (load + {ITERS} iters over (32,256) slabs): "
      f"{dtn * 1e3:.3f} ms")
print(f"NOROLL load phase: {dtn0 * 1e3:.3f} ms "
      f"({dtn0 / N * 1e6:.2f} us/point)")
print(f"NOROLL iteration phase: {(dtn - dtn0) * 1e3:.3f} ms total, "
      f"{(dtn - dtn0) / ITERS * 1e6:.2f} us/step")


# ---- load-phase scaling probes -----------------------------------------
# A real LK kernel loads slabs from BOTH pyramids (template from prev,
# search from curr) at BOTH levels: ~4 load passes. These variants measure
# whether (a) a second image's load amortizes the per-point loop overhead,
# (b) manual unrolling pipelines the serial loads.
def kernel_loads(img_ref, img2_ref, ipts_ref, out_ref, slab_scr, slab2_scr,
                 *, two, unroll):
    def load_at(p, target, ref):
        iy = ipts_ref[0, p]
        ix = ipts_ref[1, p]
        oy = pl.multiple_of(
            jnp.clip((iy - ANCHOR_Y) // 8, 0, (H - SLAB_R) // 8) * 8, 8)
        ox = pl.multiple_of(
            jnp.clip((ix - ANCHOR_X) // 128, 0,
                     (W - 2 * SLAB_C) // 128) * 128, 128)
        raw = ref[pl.ds(oy, SLAB_R), pl.ds(ox, 2 * SLAB_C)]
        rx = ix - ox - ANCHOR_X
        ry = iy - oy - ANCHOR_Y
        rolled = pltpu.roll(raw, -rx, 1)
        rolled = pltpu.roll(rolled, -ry, 0)
        target[p] = rolled[:, :SLAB_C]

    def body(i, _):
        for u in range(unroll):
            p = i * unroll + u
            load_at(p, slab_scr, img_ref)
            if two:
                load_at(p, slab2_scr, img2_ref)
        return 0

    jax.lax.fori_loop(0, N // unroll, body, 0)
    out_ref[0:1, 0:1] = (slab_scr[0, 0:1, 0:1] + slab2_scr[0, 0:1, 0:1])


def build_loads(two, unroll):
    import functools
    return pl.pallas_call(
        functools.partial(kernel_loads, two=two, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, SLAB_R, SLAB_C), jnp.float32),
                        pltpu.VMEM((N, SLAB_R, SLAB_C), jnp.float32)],
        interpret=interpret,
    )


# ---- realistic Newton-iteration kernel: batched einsum interp ----------
# The shipped Newton step's exact contraction shapes (ops/lk.py:264-282)
# over kernel-resident slabs: wy (N,WIN,S_R) @ slab (N,S_R,S_C) -> t;
# wx (N,WIN,S_C) @ t -> j_win (N,WIN,WIN); residual reductions -> b;
# 2x2 inverse-Hessian solve; masked update. Measures whether Mosaic
# lowers batched dot_general at these shapes acceptably.
def kernel_newton(slab_ref, iwin_ref, gx_g_ref, gy_g_ref, inv_ref,
                  fy_ref, fx_ref, out_ref, *, iters):
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, SLAB_R), 2).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, SLAB_C), 2).astype(jnp.float32)
    wini = jax.lax.broadcasted_iota(
        jnp.int32, (1, WIN, 1), 1).astype(jnp.float32)

    def step(it, carry):
        gy, gx, done = carry                            # (N,1,1) each
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy + wini - rows))  # (N,WIN,S_R)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx + wini - cols))  # (N,WIN,S_C)
        slab = slab_ref[:]                              # (N,S_R,S_C)
        t = jnp.einsum("nia,nab->nib", wy, slab,
                       preferred_element_type=jnp.float32)
        j_win = jnp.einsum("njb,nib->nij", wx, t,
                           preferred_element_type=jnp.float32)
        r = j_win - iwin_ref[:]                         # (N,WIN,WIN)
        bx = jnp.sum(r * gx_g_ref[:], axis=(1, 2), keepdims=True)
        by = jnp.sum(r * gy_g_ref[:], axis=(1, 2), keepdims=True)
        i11 = inv_ref[:, 0:1, 0:1]
        i12 = inv_ref[:, 0:1, 1:2]
        i22 = inv_ref[:, 1:2, 1:2]
        dx = -(i11 * bx + i12 * by)
        dy = -(i12 * bx + i22 * by)
        stepm = jnp.where(done > 0.0, 0.0, 1.0)
        gy = gy + stepm * dy
        gx = gx + stepm * dx
        done = jnp.maximum(done,
                           (dx * dx + dy * dy <= 0.03 ** 2)
                           .astype(jnp.float32))
        return gy, gx, done

    gy, gx, done = jax.lax.fori_loop(
        0, iters, step, (fy_ref[:], fx_ref[:],
                         jnp.zeros((N, 1, 1), jnp.float32)))
    out_ref[:, 0:1, 0:1] = gy + gx + done


def build_newton(iters):
    import functools
    return pl.pallas_call(
        functools.partial(kernel_newton, iters=iters),
        out_shape=jax.ShapeDtypeStruct((N, 1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


slab_in = jnp.asarray(rng.random((N, SLAB_R, SLAB_C), np.float32))
iwin = jnp.asarray(rng.random((N, WIN, WIN), np.float32))
gxw = jnp.asarray(rng.random((N, WIN, WIN), np.float32))
gyw = jnp.asarray(rng.random((N, WIN, WIN), np.float32))
invm = jnp.asarray(rng.random((N, 2, 2), np.float32))
fy3 = jnp.asarray(rng.random((N, 1, 1), np.float32) + 8.0)
fx3 = jnp.asarray(rng.random((N, 1, 1), np.float32) + 8.0)
for ni in (0, 5, 20):
    fn = jax.jit(lambda *a, _b=build_newton(ni): _b(*a))
    args = (slab_in, iwin, gxw, gyw, invm, fy3, fx3)
    try:
        r = fn(*args); r.block_until_ready()
    except Exception as e:
        print(f"newton iters={ni}: FAILED {str(e)[:200]}")
        continue
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    r.block_until_ready()
    d = (time.perf_counter() - t0) / reps
    print(f"newton-kernel iters={ni}: {d * 1e3:.3f} ms"
          + (f" ({d / ni * 1e6:.2f} us/step)" if ni else ""))

img2 = jnp.asarray(rng.random((H, W), np.float32))
for two in (False, True):
    for unroll in (1, 4):
        fn = jax.jit(lambda a, b, p, _b=build_loads(two, unroll):
                     _b(a, b, jnp.floor(p).astype(jnp.int32).T))
        r = fn(img, img2, pts); r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(img, img2, pts)
        r.block_until_ready()
        d = (time.perf_counter() - t0) / reps
        n_loads = N * (2 if two else 1)
        print(f"loads two={int(two)} unroll={unroll}: {d * 1e3:.3f} ms "
              f"({d / n_loads * 1e6:.2f} us/load)")
