#!/bin/bash
# Long-lived tunnel watcher: probe the axon TPU tunnel every 2 minutes and
# fire tools/tpu_window.sh the moment it answers. Unlike the round-3 one-shot
# loop, this RETRIES: a window where the tunnel flaps mid-run (bench never
# lands) does not spend the watcher — it goes back to probing, up to
# MAX_WINDOWS full attempts. Success = bench.py exited 0 inside the window
# (status line "bench rc=0"), which also auto-commits BENCH_INROUND.json.
#
# Run detached:  nohup bash tools/tpu_watcher.sh >/tmp/tpu_watcher.log 2>&1 &
#                echo $! > /tmp/tpu_watcher.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_window     # status lives here; tpu_window.sh also
                             # creates it, but never runs if the tunnel
                             # stays down for every probe
MAX_WINDOWS=${MAX_WINDOWS:-4}
PROBES=${PROBES:-330}        # 330 × (2 min sleep + ≤90 s probe) ≈ 12-19 h
windows=0

for i in $(seq 1 "$PROBES"); do
  if timeout 90 env JAX_PLATFORMS=axon python -c \
       "import jax; jax.devices()" >/dev/null 2>&1; then
    windows=$((windows + 1))
    echo "[watcher] tunnel up, window attempt $windows $(date -u +%H:%M:%S)"
    bash tools/tpu_window.sh >> /tmp/tpu_window_run.log 2>&1
    if grep -q "bench rc=0" /tmp/tpu_window/status 2>/dev/null; then
      echo "[watcher] official sequence complete $(date -u +%H:%M:%S)"
      exit 0
    fi
    echo "[watcher] window did not complete (tunnel flap?); resuming probes"
    if [ "$windows" -ge "$MAX_WINDOWS" ]; then
      echo "[watcher] max window attempts reached" > /tmp/tpu_window/status
      exit 1
    fi
  fi
  sleep 120
done
echo "watcher expired" > /tmp/tpu_window/status
