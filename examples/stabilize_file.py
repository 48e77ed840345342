"""Stabilize a video file (streaming mode) — counterpart of the reference's
file-capture example apps (examples/file-capture.cpp, main-ffmpeg.cpp).

Usage: python examples/stabilize_file.py in.mp4 out.mp4 [--radius 15]
(Equivalent CLI: python -m video_stab_tpu.cli stabilize in.mp4 out.mp4)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir))   # run from a source checkout

import sys

from video_stab_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["stabilize"] + sys.argv[1:]))
