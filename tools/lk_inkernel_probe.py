"""Probe: in-kernel LK with ALIGNED slab loads + per-point dynamic rolls.

The round-3 dead end (DESIGN.md 5d-quater (a)) was per-point windows at
ARBITRARY offsets: Mosaic requires 8/128-aligned dynamic vector loads
from VMEM. This probe gates the workaround the warp kernel already uses
for its residual shifts — load each point's slab at an 8/128-ALIGNED
origin (always legal), roll it once so the point's integer position
lands at a fixed (row, lane) anchor, then run EVERY Newton-style
iteration as fully vectorized math over the VMEM-resident (N, 32, 128)
slab stack with per-point hat weights built from broadcasted iotas.

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


def kernel(img_ref, pts_ref, out_ref, slab_scr, guess_scr, acc_scr, *,
           iters):
    """pts_ref: (N, 2) f32 in VMEM (y, x). Scalar reads via SMEM would be
    cleaner; this probe reads per-point scalars from the VMEM vector to
    keep the call surface minimal."""

    # ---- phase 1: aligned load + per-point roll --------------------------
    def load_one(p, _):
        py = pts_ref[p, 0]
        px = pts_ref[p, 1]
        iy = jnp.floor(py).astype(jnp.int32)
        ix = jnp.floor(px).astype(jnp.int32)
        # Aligned origin: the greatest (8,128) corner such that the
        # anchor-relative window stays inside the slab.
        oy = jnp.clip((iy - ANCHOR_Y) // 8 * 8, 0, H - SLAB_R)
        ox = jnp.clip((ix - ANCHOR_X) // 128 * 128, 0, W - 2 * SLAB_C)
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

    # Template/gradient surrogate: fixed per-point windows. A real kernel
    # would load these once from the PREV pyramid the same way; for cost
    # purposes reuse the slab itself.
    guess_scr[:] = pts_ref[:] - jnp.floor(pts_ref[:])   # fractional part

    # ---- phase 2: vectorized iteration ladder ---------------------------
    rows = jax.lax.broadcasted_iota(jnp.float32, (1, SLAB_R, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, SLAB_C), 2)

    win_i = jax.lax.broadcasted_iota(jnp.float32, (1, WIN, 1), 1)

    def step_reduce(it, carry):
        """Variant A — pure weighted reductions (VPU-only lower bound)."""
        jitter = carry * 1e-9
        gy = guess_scr[:, 0][:, None, None] + jitter    # (N,1,1)
        gx = guess_scr[:, 1][:, None, None] + jitter
        # Hat weights with support [anchor, anchor+WIN+1): the bilinear
        # interpolation AND the window extent in one weight vector —
        # matches the shipped one-hot-matmul structure (ops/lk.py newton).
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(rows - (gy + ANCHOR_Y)))  # (N,32,1) eff.
        wy = wy * (rows >= ANCHOR_Y) * (rows < ANCHOR_Y + WIN + 1)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cols - (gx + ANCHOR_X)))
        wx = wx * (cols >= ANCHOR_X) * (cols < ANCHOR_X + WIN + 1)
        slab = slab_scr[:]                               # (N,32,128)
        # Two weighted reductions standing in for the residual x/y
        # moments b = sum (J - I) * gradI.
        t = jnp.sum(slab * wy, axis=1)                   # (N,128)
        bx = jnp.sum(t * wx[:, 0, :], axis=1)            # (N,)
        ty = jnp.sum(slab * wx, axis=2)                  # (N,32)
        by = jnp.sum(ty * wy[:, :, 0], axis=1)           # (N,)
        return carry + jnp.sum(bx) * 1e-9 + jnp.sum(by) * 1e-9

    def step_einsum(it, carry):
        """Variant B — the shipped Newton step's exact einsum shapes
        (ops/lk.py:264-282) over the resident slab: j_win via two
        chained contractions, then the stacked-gradient residual
        reduction. Measures whether Mosaic lowers these to something
        MXU-shaped in-kernel."""
        jitter = carry * 1e-9
        gy = guess_scr[:, 0][:, None, None] + jitter
        gx = guess_scr[:, 1][:, None, None] + jitter
        # wy[n,i,a] = hat(gy + i - (a - ANCHOR)): window row i -> slab
        # row a; same for columns.
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            gy + win_i - (rows.transpose(0, 2, 1) - ANCHOR_Y)))  # (N,15,32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            gx + win_i - (cols - ANCHOR_X)))                     # (N,15,128)
        slab = slab_scr[:]                                       # (N,32,128)
        t = jnp.einsum("nia,nab->nib", wy, slab,
                       preferred_element_type=jnp.float32)       # (N,15,128)
        j_win = jnp.einsum("njb,nib->nij", wx, t,
                           preferred_element_type=jnp.float32)   # (N,15,15)
        # Residual reduction vs the (template, gradient) stack — reuse
        # j_win as a surrogate g_stack to keep operand shapes honest.
        g_stack = jnp.stack([j_win, j_win], axis=1)              # (N,2,15,15)
        b = jnp.einsum("nij,ncij->nc", j_win, g_stack,
                       preferred_element_type=jnp.float32)       # (N,2)
        return carry + jnp.sum(b) * 1e-9

    step = step_einsum if os.environ.get("LK_PROBE_VARIANT") == "einsum" \
        else step_reduce
    acc = jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
    acc_scr[0, 0] = acc
    out_ref[0, 0] = acc_scr[0, 0]


interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((H, W), np.float32))
pts = jnp.asarray(
    np.stack([rng.uniform(20, H - 60, N), rng.uniform(20, W - 180, N)],
             axis=1).astype(np.float32))


def build(iters):
    import functools
    return pl.pallas_call(
        functools.partial(kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, SLAB_R, SLAB_C), jnp.float32),
                        pltpu.VMEM((N, 2), jnp.float32),
                        pltpu.VMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )


@jax.jit
def run(img, pts):
    return build(ITERS)(img, pts)


def timed(fn, reps):
    r = fn(img, pts)
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(img, pts)
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
run0 = jax.jit(lambda img, pts: build(0)(img, pts))
dt0, _ = timed(run0, reps)
per_iter = (dt - dt0) / ITERS
print(f"load+roll phase: {dt0 * 1e3:.3f} ms "
      f"({dt0 / N * 1e6:.2f} us/point)")
print(f"iteration phase: {(dt - dt0) * 1e3:.3f} ms total, "
      f"{per_iter * 1e6:.2f} us/step (XLA dispatch equivalent ~6 us/step "
      f"at 5 fused steps per ~30 us trip)")
