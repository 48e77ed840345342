"""Serve N camera streams batched across the TPU mesh — the multi-camera
deployment (BASELINE.json config 5: "8x concurrent 1080p streams batched
across a TPU slice"). Sources here are synthetic; swap open_source() targets
for real RTSP URLs.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir))   # run from a source checkout

import argparse
import time

import numpy as np

from video_stab_tpu.core.params import StabilizerParams
from video_stab_tpu.io.sources import SourceParams, SyntheticSource
from video_stab_tpu.parallel import MultiStreamStabilizer, make_stream_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()

    mesh = make_stream_mesh()
    print(f"mesh: {mesh.shape} over {len(mesh.devices.flat)} devices")
    params = StabilizerParams(smoothing_radius=10,
                              analysis_width=min(args.width, 960),
                              analysis_height=min(args.height, 540))
    ms = MultiStreamStabilizer(params, n_streams=args.streams, mesh=mesh)

    sources = [
        SyntheticSource(SourceParams(source=f"cam{i}",
                                     threaded_queue_mode=False),
                        height=args.height, width=args.width, seed=i).start()
        for i in range(args.streams)
    ]
    t0 = time.perf_counter()
    out_frames = 0
    for _ in range(args.frames):
        batch = np.stack([s.read() for s in sources])
        out = ms.stabilize_batch(batch)
        if out is not None:
            out_frames += out.shape[0]
    dt = time.perf_counter() - t0
    print(f"{out_frames} stabilized frames across {args.streams} streams "
          f"in {dt:.2f}s -> {out_frames / dt:.1f} frames/s aggregate")
    for s in sources:
        s.stop()


if __name__ == "__main__":
    main()
