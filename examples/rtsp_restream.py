"""Stabilize a source and serve the result over real RTSP/H.264 —
counterpart of the reference's serve-while-processing apps
(examples/vs.cpp / final.cpp: stabilize -> RTSPServer::pushFrame;
src/RTSPServer.cpp:163-214).

Usage:
  python examples/rtsp_restream.py [--source synthetic:320x240]
                                   [--port 8554] [--seconds 30]
Play with any client (TCP transport):
  ffplay -rtsp_transport tcp rtsp://127.0.0.1:8554/stream
  vlc --rtsp-tcp rtsp://127.0.0.1:8554/stream
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir))   # run from a source checkout

import argparse
import time

from video_stab_tpu.core.params import StabilizerParams
from video_stab_tpu.core.stabilizer import Stabilizer
from video_stab_tpu.io.rtsp import RTSPServer, rtsp_available
from video_stab_tpu.io.sources import SourceParams, open_source


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="synthetic:320x240")
    ap.add_argument("--port", type=int, default=8554)
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()

    if not rtsp_available():
        raise SystemExit("native H.264 encoder unavailable on this host")

    source = open_source(args.source, SourceParams(source=args.source))
    source.start()
    server = RTSPServer(port=args.port, mount="/stream", fps=30).start()
    st = Stabilizer(StabilizerParams(smoothing_radius=10))
    print(f"serving stabilized {args.source} at {server.url} "
          f"(rtsp_transport=tcp)")

    t0 = time.monotonic()
    n = 0
    try:
        while time.monotonic() - t0 < args.seconds:
            frame = source.read()
            if frame is None:
                continue
            out = st.stabilize(frame)
            if out is not None:
                server.push_frame(out)
                n += 1
    finally:
        print(f"pushed {n} frames to {server.n_clients} client(s)")
        server.close()
        source.stop()


if __name__ == "__main__":
    main()
