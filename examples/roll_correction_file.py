"""Roll-correct + auto-zoom-crop a video file — counterpart of
examples/roll-correction-file.cpp:12-68 (RollCorrection -> AutoZoomCrop per
frame).

Usage: python examples/roll_correction_file.py in.mp4 out.mp4
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir))   # run from a source checkout

import sys

import cv2

from video_stab_tpu import (
    AutoZoomCrop,
    AutoZoomCropParams,
    RollCorrection,
    RollCorrectionParams,
)
from video_stab_tpu.io.sinks import EncoderParams, FileSink


def main(argv):
    cv2.setNumThreads(0)
    src, dst = argv[0], argv[1]
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        print(f"cannot open {src}", file=sys.stderr)
        return 1
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    roll = RollCorrection(RollCorrectionParams())
    azc = AutoZoomCrop(AutoZoomCropParams())
    sink = FileSink(dst, EncoderParams(fps=fps))
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        corrected = roll.auto_correct_roll(frame)          # (.cpp:61-64)
        cropped = azc.auto_zoom_crop(corrected)            # (.cpp:66-68)
        sink.write(cropped)
        n += 1
    sink.close()
    cap.release()
    print(f"processed {n} frames -> {dst} "
          f"(final roll angle {roll.smoothed_angle:.2f} deg)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
