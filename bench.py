"""Benchmark: steady-state stabilized frames/sec/chip at 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's design frame rate on its target hardware is 30 fps
at 1080p (Jetson Orin Nano; BASELINE.md — GstdManager.h:24, RTSPServer.h:16),
so vs_baseline = fps / 30.

Measures the combined analyze+emit step (one XLA program per frame) with
donated state, including host->device upload of each uint8 frame — i.e. the
full per-frame device path a serving deployment pays.
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_bench(height=1080, width=1920, n_warmup=3, n_iters=30,
              smoothing_radius=15):
    import jax

    from video_stab_tpu.core.params import StabilizerParams
    from video_stab_tpu.core.stabilizer import stabilizer_step
    from video_stab_tpu.core.state import stabilizer_state_init

    params = StabilizerParams(smoothing_radius=smoothing_radius)
    state = stabilizer_state_init(params, height, width)

    rng = np.random.default_rng(0)
    # A fixed pool of realistic-entropy frames (avoid measuring rng).
    frames = [
        jax.device_put(rng.integers(0, 255, (height, width, 3),
                                    dtype=np.uint8))
        for _ in range(4)
    ]
    jax.block_until_ready(frames)

    # Warm-up: fill the look-ahead queue + compile.
    for i in range(max(n_warmup, params.effective_radius + 1)):
        state, out = stabilizer_step(params, state, frames[i % len(frames)])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(n_iters):
        state, out = stabilizer_step(params, state, frames[i % len(frames)])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt
    return fps, dt / n_iters * 1e3


def main():
    import jax

    platform = jax.devices()[0].platform
    fps, ms = run_bench()
    print(json.dumps({
        "metric": "stabilized_fps_1080p",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 30.0, 3),
        "p50_ms_per_frame": round(ms, 3),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
