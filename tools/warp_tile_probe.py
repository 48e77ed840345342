"""Warp output-tile shape + tier-ladder probes (round-4 methodology).

TIMING RULE (learned the hard way): through the axon tunnel, timing
repeated INDEPENDENT jit calls under-measures by up to ~100x — the
runtime overlaps data-independent executions, and blocking on the last
result only waits for that one chain. Every measurement here therefore
CHAINS iterations through a donated carry (frame -> warp -> frame) and
syncs with a scalar pull, exactly like tools/warp_probe.py.

Modes:
  sweep   — tile-shape sweep at several envelopes (set SWEEP_TH/SWEEP_TW
            to override the module tile; default = shipped _pick_tile)
  active  — warp cost at a SUSTAINED rotation (ANG deg, default 2.0)
            inside a 13-deg envelope: the fused-roll chain's regime,
            where the tier ladder's granularity sets the tap bill.
            FRACS=0.0625,0.25 overrides TIER_FRACS_WIDE.

Round-4 results (v5e, 2026-08-18; DESIGN.md 5d-novies):
  (64,256) 1080p env3 0.49 / 4K env3 1.59 / env6 0.55; OOM at env15.
  (64,128) env15 0.80 — kept as the wide-envelope tile.
  active 2 deg @env13: coarse ladder 1.34 ms, fine ladder 1.13 ms.

Run:  timeout 900 python tools/warp_tile_probe.py [sweep|active]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import video_stab_tpu.pallas.warp as W

if os.environ.get("SWEEP_TH"):
    th = int(os.environ["SWEEP_TH"])
    tw = int(os.environ.get("SWEEP_TW", 128))
    W._pick_tile = lambda s: (th, tw)
if os.environ.get("FRACS"):
    W.TIER_FRACS_WIDE = tuple(
        float(x) for x in os.environ["FRACS"].split(","))

import jax
import jax.numpy as jnp

from video_stab_tpu.utils.cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  compilation_cache_dir(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from video_stab_tpu.ops.warp import similarity_matrix

K = 120
rng = np.random.default_rng(0)
mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"


def bench(h, w, env, label, ang_deg=None, k=K):
    frame = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8)))

    def scan_warp(img):
        def body(c, i):
            if ang_deg is None:
                a = (i.astype(jnp.float32) % 7.0 - 3.0) * 0.003
            else:
                a = jnp.radians(ang_deg) \
                    + (i.astype(jnp.float32) % 7.0 - 3.0) * 0.0005
            m = similarity_matrix(3.0, 2.0, a)
            out = W.warp_affine_u8(c, m, max_angle_deg=env, max_shift=128)
            return out, None

        img, _ = jax.lax.scan(body, img, jnp.arange(k, dtype=jnp.int32))
        return img, jnp.mean(img.astype(jnp.float32))

    fn = jax.jit(scan_warp, donate_argnums=0)
    try:
        compiled = fn.lower(frame).compile()
        frame2, m = compiled(frame)
        float(m)
    except Exception as e:  # noqa: BLE001 — report-and-continue probe
        print(f"{label}: FAILED {str(e)[:110]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(3):
        frame2, m = compiled(frame2)
    float(m)
    print(f"{label}: {(time.perf_counter() - t0) / (3 * k) * 1e3:8.4f} "
          f"ms/warp", flush=True)


if mode == "active":
    ang = float(os.environ.get("ANG", "2.0"))
    bench(1080, 1920, 13.0,
          f"active {ang} deg @env13 fracs={W.TIER_FRACS_WIDE}",
          ang_deg=ang)
else:
    bench(1080, 1920, 3.0, "1080p env=3")
    bench(2160, 3840, 3.0, "4K    env=3", k=60)
    bench(1080, 1920, 6.0, "1080p env=6")
    bench(1080, 1920, 15.0, "1080p env=15 (wide tile)")
