#!/bin/bash
# Healthy-transfer-window watcher. The 2026-08-18 tunnel window ran the
# chip fine but moved host<->device at ~0.01 GB/s, so every host-touching
# metric (p50 per-dispatch, delivered-to-host fps, end-to-end fps) is
# labeled latency_tunnel_bound in BENCH_INROUND.json. This loop probes the
# transfer path every ~12 min and re-runs the official bench the moment a
# healthy window (>0.4 GB/s H2D) appears, then auto-commits the refreshed
# record (pathspec-limited, same rationale as tools/tpu_window.sh).
#
# Exits when: a healthy-window bench lands (success), BENCH_r05.json
# appears (the driver's round-end capture owns the chip from then on),
# or PROBES attempts expire.
#
# Run detached:  nohup bash tools/bw_watcher.sh >/tmp/bw_watcher.log 2>&1 &
#                echo $! > /tmp/bw_watcher.pid
set -u
cd "$(dirname "$0")/.."
PROBES=${PROBES:-20}
# Hard deadline (unix ts): never LAUNCH a bench after this — a watcher
# bench overlapping the driver's round-end capture would contend on
# .bench_lock and could push the OFFICIAL record past its outer timeout
# (the exact null-record failure round 3 suffered). Default 0 = no limit.
DEADLINE_TS=${DEADLINE_TS:-0}

probe_bw() {
  timeout 180 python - <<'EOF'
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
x = np.zeros((32 << 20,), np.uint8)          # 32 MiB
d = jax.device_put(x); d.block_until_ready() # warm the path
t0 = time.perf_counter()
d = jax.device_put(x); d.block_until_ready()
h2d = 32 / 1024 / (time.perf_counter() - t0)  # GiB/s
t0 = time.perf_counter()
_ = np.asarray(d)
d2h = 32 / 1024 / (time.perf_counter() - t0)
print(f"h2d={h2d:.3f} d2h={d2h:.3f} GiB/s", file=sys.stderr)
# bench.py labels latency_tunnel_bound below 2.0 GB/s (bench.py:614);
# gate a little under it so a just-healthy window still fires.
sys.exit(0 if (h2d > 1.5 and d2h > 1.0) else 1)
EOF
}

for i in $(seq 1 "$PROBES"); do
  if [ -f BENCH_r05.json ]; then
    echo "[bw_watcher] driver round-end record exists; exiting"
    exit 0
  fi
  if [ "$DEADLINE_TS" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE_TS" ]; then
    echo "[bw_watcher] deadline reached; yielding the chip to the driver"
    exit 0
  fi
  if probe_bw; then
    echo "[bw_watcher] healthy transfer window $(date -u +%H:%M:%S); benching"
    timeout 1500 python bench.py > /tmp/bw_watcher_bench.log 2>&1
    rc=$?
    tail -1 /tmp/bw_watcher_bench.log
    if [ $rc -eq 0 ] && ! git diff --quiet -- BENCH_INROUND.json; then
      if grep -q '"latency_tunnel_bound": false' BENCH_INROUND.json; then
        git commit -q \
          -m "Record healthy-window TPU bench (delivered/p50/e2e un-tunnel-bound)" \
          -- BENCH_INROUND.json
        echo "[bw_watcher] healthy-window record committed; done"
        exit 0
      fi
      # Still tunnel-bound despite the probe passing: keep the fresher
      # record anyway (it never regresses the on-device metrics).
      git commit -q \
        -m "Record in-round TPU bench (bw probe passed; host metrics still labeled)" \
        -- BENCH_INROUND.json
      echo "[bw_watcher] record refreshed but still tunnel-bound; resuming probes"
    fi
  fi
  sleep 700
done
echo "[bw_watcher] expired without a healthy window"
