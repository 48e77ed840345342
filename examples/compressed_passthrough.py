"""Compressed-domain passthrough with a hot switch into processing —
counterpart of the reference's gstd/interpipe mode switching
(examples/main-gstd-interpipe.cpp + GstdManager.cpp:155-180, 324-327):
passthrough relays H.264 access units byte-identically with NO decoder;
switching to processing attaches the decoder mid-stream and resumes at the
next IDR.

Usage:
  python examples/compressed_passthrough.py in.h264 out.h264
      [--switch-at 60]      # access units before switching to processing

The input may be an Annex-B .h264 file, an mp4/mkv container (demuxed
compressed — never decoded in passthrough), or a live rtsp:// URL.
For the MANAGED-app version of the same graph (lossless packet channels,
hot config/keyboard switching), run:  vstab run cfg.yaml  with an
H.264-capable source+output — packet mode engages automatically.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir))   # run from a source checkout

import argparse

from video_stab_tpu.core.params import StabilizerParams
from video_stab_tpu.core.stabilizer import Stabilizer
from video_stab_tpu.io.packets import (PacketDecoderBridge,
                                       open_packet_sink,
                                       open_packet_source)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--switch-at", type=int, default=-1,
                    help="-1 = pure passthrough (no decode ever)")
    args = ap.parse_args()

    # Dispatches by source type: Annex-B .h264, container mp4/mkv (native
    # demux, no decode), or a live rtsp:// camera (packet-level client).
    src = open_packet_source(args.input)
    # Output dispatch too: .h264 byte stream, mp4/mkv (remux, no
    # re-encode), or rtsp:// serving.
    sink = open_packet_sink(args.output)
    bridge = PacketDecoderBridge()
    st = None
    n = relayed = decoded = stabilized = 0
    while True:
        au = src.read()
        if au is None:
            break
        if args.switch_at < 0 or n < args.switch_at:
            sink.write(au)          # byte-identical, zero decode cost
            relayed += 1
            assert not bridge.decoder_constructed
        else:
            for frame in bridge.decode_unit(au):
                decoded += 1
                if st is None:
                    st = Stabilizer(StabilizerParams(smoothing_radius=10))
                if st.stabilize(frame) is not None:
                    stabilized += 1
        n += 1
    # End-of-stream: drain the decoder's reorder tail through the
    # stabilizer too, then flush the stabilizer's own look-ahead queue.
    for frame in bridge.flush():
        decoded += 1
        if st is not None and st.stabilize(frame) is not None:
            stabilized += 1
    if st is not None:
        while st.flush() is not None:
            stabilized += 1
    had_decoder = bridge.decoder_constructed
    sink.close()
    src.stop()
    bridge.close()
    print(f"access units: {n}  relayed byte-identical: {relayed}  "
          f"decoded frames: {decoded}  stabilized frames: {stabilized}  "
          f"decoder constructed: {had_decoder}")
    # Note: after a mid-stream switch, decoding resumes at the next IDR
    # (gop boundary) — the same resync semantics as any streaming client.


if __name__ == "__main__":
    main()
