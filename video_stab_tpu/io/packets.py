"""Compressed-domain (packet-level) streaming: H.264 passthrough without
decode.

The reference's passthrough mode never touches pixels — GstdManager relays
H.264 via interpipe (GstdManager.cpp:155-180: rtspsrc->depay->parse->
interpipesink, and the output pipeline rtspclientsink), which is why
passthrough adds only 10-20 ms (README_GSTD_INTERPIPE.md:157) while
processing mode pays decode + re-encode (~50-100 ms, :158).

This module is that packet domain for the TPU framework:

- :class:`PacketSource` — reads an Annex-B H.264 elementary stream (file or
  socket) and yields access units (lists of NAL units, bytes), no decode.
- :class:`PacketFileSink` — byte-identical packet writer (the relay sink).
- :class:`PacketDecoderBridge` — packet channel -> native decoder -> BGR
  frames; the GstdManager *processing* pipeline's decoder stage
  (GstdManager.cpp:182-211), attached only while processing mode is active.

Packets ride the same named-channel StreamGraph as frames (io/channels.py),
so the listen-to switch (GstdManager.cpp:324-327) works identically: the
output pipeline re-points between the compressed "source_pkt" channel
(passthrough) and the re-encoded "processed" channel.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Iterator, List, Optional

import numpy as np

from video_stab_tpu.io.codec import VideoDecoder, nal_type, split_nal_units
from video_stab_tpu.utils.telemetry import get_logger

VCL_TYPES = {1, 2, 3, 4, 5}       # coded-slice NAL unit types


def _starts_new_picture(nal: bytes) -> bool:
    """True when a VCL NAL begins a new coded picture: its slice header's
    first field, first_mb_in_slice (ue(v)), is 0 — encoded as a leading
    '1' bit. Multi-slice pictures (x264 sliced-threads) have first_mb > 0
    for the follow-on slices."""
    i = 3 if nal[:3] == b"\x00\x00\x01" else 4
    if len(nal) <= i + 1:
        return True
    return (nal[i + 1] & 0x80) != 0


def group_access_units(nals: List[bytes]) -> Iterator[List[bytes]]:
    """Group a NAL sequence into access units (one coded picture each):
    non-VCL NALs (SPS, PPS, SEI, AUD) attach to the NEXT picture; a VCL NAL
    with first_mb_in_slice == 0 starts a new picture; additional slices of
    the same picture (sliced-threads encoders) stay in the same unit."""
    pending: List[bytes] = []
    has_vcl = False
    for nal in nals:
        if nal_type(nal) in VCL_TYPES and has_vcl \
                and _starts_new_picture(nal):
            yield pending
            pending = []
            has_vcl = False
        pending.append(nal)
        if nal_type(nal) in VCL_TYPES:
            has_vcl = True
    if pending:
        yield pending


class PacketSource:
    """Access-unit reader over an Annex-B H.264 byte stream.

    File variant of the reference's compressed ingest (rtspsrc->depay->
    h264parse, GstdManager.cpp:155-180): no decoder is ever constructed.
    ``read()`` returns one access unit (list of NAL bytes) or None at EOF.
    """

    def __init__(self, path: str, chunk_size: int = 1 << 16,
                 realtime_fps: float = 0.0):
        self.path = path
        self.chunk_size = chunk_size
        self.realtime_fps = realtime_fps    # 0 -> as fast as possible
        self._file = None
        self._buf = b""
        self._pending: List[bytes] = []     # open (unclosed) access unit
        self._pending_vcl = False
        self._aus: List[List[bytes]] = []
        self._eof = False
        self.units_read = 0

    def start(self) -> "PacketSource":
        self._file = open(self.path, "rb")
        return self

    def _push_nal(self, nal: bytes) -> None:
        """Incremental AU grouping across arbitrary chunk boundaries."""
        is_vcl = nal_type(nal) in VCL_TYPES
        if is_vcl and self._pending_vcl and _starts_new_picture(nal):
            self._aus.append(self._pending)
            self._pending = []
            self._pending_vcl = False
        self._pending.append(nal)
        self._pending_vcl = self._pending_vcl or is_vcl

    def _fill(self) -> None:
        while not self._aus and not self._eof:
            chunk = self._file.read(self.chunk_size)
            if not chunk:
                self._eof = True
                if self._buf:
                    for nal in split_nal_units(self._buf):
                        self._push_nal(nal)
                    self._buf = b""
                if self._pending:
                    self._aus.append(self._pending)
                    self._pending = []
                return
            self._buf += chunk
            nals = split_nal_units(self._buf)
            if len(nals) > 1:
                # Keep the (possibly incomplete) last NAL buffered.
                for nal in nals[:-1]:
                    self._push_nal(nal)
                self._buf = nals[-1]

    def read(self) -> Optional[List[bytes]]:
        if self._file is None:
            self.start()
        self._fill()
        if not self._aus:
            return None
        if self.realtime_fps > 0:
            time.sleep(1.0 / self.realtime_fps)
        self.units_read += 1
        return self._aus.pop(0)

    def stop(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


class PacketFileSink:
    """Byte-identical Annex-B writer — the passthrough relay's tail."""

    def __init__(self, path: str):
        self.path = path
        self._file = None
        self.units_written = 0

    def write(self, au: List[bytes]) -> None:
        if self._file is None:
            self._file = open(self.path, "wb")
        for nal in au:
            self._file.write(nal)
        self.units_written += 1

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


class PacketDecoderBridge:
    """Packet -> pixel bridge: feeds access units to the native decoder and
    emits BGR frames (the nvv4l2decoder stage of the processing pipeline,
    GstdManager.cpp:182-211). Constructed lazily — passthrough mode never
    instantiates a decoder."""

    def __init__(self, codec: str = "h264"):
        self.codec = codec
        self._decoder: Optional[VideoDecoder] = None
        self.frames_out = 0

    def decode_unit(self, au: List[bytes]) -> List[np.ndarray]:
        if self._decoder is None:
            self._decoder = VideoDecoder(self.codec)
        frames = self._decoder.decode(b"".join(au))
        self.frames_out += len(frames)
        return frames

    def flush(self) -> List[np.ndarray]:
        if self._decoder is None:
            return []
        frames = self._decoder.flush()
        self.frames_out += len(frames)
        return frames

    @property
    def decoder_constructed(self) -> bool:
        return self._decoder is not None

    def close(self) -> None:
        if self._decoder is not None:
            self._decoder.close()
            self._decoder = None


class PacketRelay:
    """The passthrough pipeline: PacketSource -> sinks, byte-identical, no
    decode — GstdManager's passthrough + output pipelines collapsed into a
    thread. Sinks: anything with write(au) (PacketFileSink, RTSPServer via
    push_packet, a StreamGraph channel publish).
    """

    def __init__(self, source: PacketSource,
                 sinks: Optional[List] = None,
                 on_unit: Optional[Callable[[List[bytes]], None]] = None):
        self.source = source
        self.sinks = sinks or []
        self.on_unit = on_unit
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.units_relayed = 0
        self.log = get_logger("PacketRelay", False)

    def _run(self):
        while not self._stop.is_set():
            au = self.source.read()
            if au is None:
                break
            for s in self.sinks:
                s.write(au)
            if self.on_unit is not None:
                self.on_unit(au)
            self.units_relayed += 1

    def start(self) -> "PacketRelay":
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="packet-relay")
        self._thread.start()
        return self

    def join(self, timeout: float = 30.0) -> None:
        if self._thread:
            self._thread.join(timeout)

    def stop(self) -> None:
        self._stop.set()
        self.join(2.0)
