"""Detection + tracking with TCP click-to-track selection — counterpart of
the reference's tracker wiring (examples/vsg.cpp:1292-1306: DeepStreamTracker
+ TcpReciever on port 5000; send "x y\\n" to select the track under that
point).

Usage: python examples/click_to_track.py [--port 5000] [--frames 100]
Then:  echo "320 180" | nc 127.0.0.1 5000
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir))   # run from a source checkout

import argparse

import numpy as np

from video_stab_tpu.io.control import TcpReceiver
from video_stab_tpu.io.sources import SourceParams, SyntheticSource
from video_stab_tpu.models import ObjectTracker, TrackerParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()

    tracker = ObjectTracker(TrackerParams(processing_width=320,
                                          processing_height=192,
                                          confidence_threshold=0.3))
    tcp = TcpReceiver(args.port).start()
    src = SyntheticSource(SourceParams(source="cam",
                                       threaded_queue_mode=False),
                          height=360, width=640).start()
    try:
        for i in range(args.frames):
            frame = src.read()
            dets = tracker.process_frame(frame)
            click = tcp.try_get_latest()
            if click:
                vis = tracker.draw_detections(frame, dets, *click)
                print(f"frame {i}: click {click} -> selected track "
                      f"{tracker._selected_id}")
            else:
                vis = tracker.draw_detections(frame, dets)
            del vis
    finally:
        tcp.stop()
        src.stop()
        tracker.release()


if __name__ == "__main__":
    main()
