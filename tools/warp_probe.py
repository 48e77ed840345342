"""Timing probes for warp kernel overhead components (NOT correctness —
variants intentionally compute wrong pixels to isolate costs)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from video_stab_tpu.utils.cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  compilation_cache_dir(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import video_stab_tpu.pallas.warp as W
from video_stab_tpu.ops.warp import similarity_matrix

K = 120
H, Wd = 1080, 1920
rng = np.random.default_rng(0)
frame = jax.device_put(jnp.asarray(
    rng.integers(0, 255, (H, Wd, 3), dtype=np.uint8)))

mode = sys.argv[1] if len(sys.argv) > 1 else "base"

if mode == "noroll":
    # Patch: drop the two dynamic rolls (wrong pixels, same traffic).
    import jax.experimental.pallas.tpu as pltpu_mod
    from jax.experimental.pallas import tpu as pltpu
    _orig = pltpu.roll
    def fake_roll(x, shift, axis):
        return x
    pltpu.roll = fake_roll
elif mode == "notaps":
    # Keep slicing/rolls; single tap only (isolates MAC cost). Signature
    # mirrors pallas/warp._envelope_terms(max_angle_deg, th, tw).
    def one_term(_deg, th=None, tw=None):
        return 1, 1
    W._envelope_terms = one_term
elif mode == "floor":
    # No rolls AND single tap: pipeline + convert + store only.
    from jax.experimental.pallas import tpu as pltpu
    pltpu.roll = lambda x, shift, axis: x
    def one_term(_deg, th=None, tw=None):
        return 1, 1
    W._envelope_terms = one_term

def scan_warp(img):
    def body(c, i):
        ang = (i.astype(jnp.float32) % 7.0 - 3.0) * 0.003
        m = similarity_matrix(ang * 10.0, ang * 7.0, ang)
        out = W.warp_affine_u8(c, m, max_angle_deg=3.0, max_shift=128)
        return out, jnp.float32(0.0)
    img, _ = jax.lax.scan(body, img, jnp.arange(K, dtype=jnp.int32))
    return img, jnp.mean(img.astype(jnp.float32))

fn = jax.jit(scan_warp, donate_argnums=0)
compiled = fn.lower(frame).compile()
frame, m = compiled(frame)
float(m)
t0 = time.perf_counter()
for _ in range(3):
    frame, m = compiled(frame)
float(m)
dt = (time.perf_counter() - t0) / (3 * K) * 1e3
print(f"{mode:10s} {dt:8.4f} ms/warp", flush=True)
