"""Prototype: can Mosaic do per-point dynamic (row, lane) window loads from
a VMEM image ref inside an in-kernel loop, and what do they cost?

This is the capability gate for an in-kernel LK iteration loop. Measures a
fake 'Newton step': N per-point 16x16 dynamic-offset loads + a vectorized
blend/reduce, repeated ITERS times inside one kernel.

Run: timeout 900 python tools/lk_kernel_proto.py [interpret]
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

N = 200
ITERS = 20
WIN = 15
H, W = 302, 512


def kernel(img_ref, pt_ref, out_ref, win_scr, pt_scr):
    # pt_ref: (N, 2) f32. win_scr: (N, 16, 16) f32 scratch.
    pt_scr[:] = pt_ref[:]

    def step(it, carry):
        acc = carry
        # Serial per-point extraction: 16x16 window at dynamic offsets.
        for p in range(N):
            py = pt_scr[p, 1] + acc * 1e-9
            px = pt_scr[p, 0]
            iy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 16)
            ix = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 16)
            win_scr[p] = img_ref[pl.ds(iy, 16), pl.ds(ix, 16)]
        # Vectorized phase: bilinear blend + reductions across all points.
        w = win_scr[:]
        a = w[:, :WIN, :WIN]
        b = w[:, :WIN, 1:WIN + 1]
        c = w[:, 1:WIN + 1, :WIN]
        d = w[:, 1:WIN + 1, 1:WIN + 1]
        j = 0.25 * a + 0.25 * b + 0.25 * c + 0.25 * d
        s = jnp.sum(j, axis=(1, 2))                     # (N,)
        return acc + jnp.sum(s) * 1e-9

    out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))


interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((H, W), np.float32))
pts = jnp.asarray(rng.random((N, 2), np.float32)
                  * np.array([W - 20, H - 20], np.float32))


@jax.jit
def run(img, pts):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((N, 16, 16), jnp.float32),
                        pltpu.VMEM((N, 2), jnp.float32)],
        interpret=interpret,
    )(img, pts)


t0 = time.perf_counter()
r = run(img, pts)
r.block_until_ready()
print(f"compile+run: {time.perf_counter() - t0:.1f}s result={float(r[0,0]):.6f}")
t0 = time.perf_counter()
REP = 50
p = pts
for _ in range(REP):
    # Chained reps (TIMING RULE, warp_tile_probe.py): data-independent
    # repeats overlap on this runtime and under-measure badly.
    r = run(img, p)
    p = p + 0.0 * r[0, 0]
r.block_until_ready()
dt = (time.perf_counter() - t0) / REP
print(f"per-call: {dt*1e3:.3f} ms  per step: {dt/ITERS*1e6:.2f} us "
      f"per point-step: {dt/(ITERS*N)*1e9:.1f} ns")
