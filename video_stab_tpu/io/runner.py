"""The orchestrator — counterpart of the reference's application layer
(examples/vsg.cpp, the most-evolved variant; SURVEY.md §3.3).

Wires the stream graph the way vsg.cpp wires its 5 in-process pipelines
(vsg.cpp:405-601):

  source:      FrameSource -> "source" channel
  processing:  "source" -> enhance -> roll-correct -> stabilize -> track
               -> "processed" channel                      (vsg.cpp:1246-1313)
  output:      listen-to {"source" | "processed"} -> sink  (vsg.cpp:518-525)

plus: YAML config + mtime hot reload with Stabilizer re-creation and
seamless passthrough<->processing switching (vsg.cpp:1346-1415), TCP
click-to-track coordinates (vsg.cpp:1292-1306), optional REST config API,
structured metrics.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

from video_stab_tpu.core.autozoomcrop import AutoZoomCrop
from video_stab_tpu.core.chain import ProcessingChain
from video_stab_tpu.core.enhancer import Enhancer
from video_stab_tpu.core.rollcorrection import RollCorrection
from video_stab_tpu.core.stabilizer import Stabilizer
from video_stab_tpu.io.channels import StreamGraph
from video_stab_tpu.io.control import (ConfigRestServer, KeyboardController,
                                       TcpReceiver)
from video_stab_tpu.io.sinks import FrameSink, open_sink
from video_stab_tpu.io.sources import SourceParams, open_source
from video_stab_tpu.utils.config import AppConfig, ConfigWatcher, load_config
from video_stab_tpu.utils.telemetry import Metrics, get_logger


class StabilizerApp:
    """`vstab run config.yaml` — the vsg.cpp main loop as a library object."""

    def __init__(self, config: AppConfig, config_path: Optional[str] = None,
                 sink: Optional[FrameSink] = None,
                 enable_tcp: bool = False, tcp_port: int = 5000,
                 enable_rest: bool = False, rest_port: int = 5001,
                 max_frames: int = 0, fused: bool = True,
                 packet_mode: Optional[bool] = None):
        self.cfg = config
        self.fused = fused
        self.config_path = config_path
        self.metrics = Metrics()
        self.log = get_logger("App", True)
        self.max_frames = max_frames
        self._lock = threading.Lock()     # config snapshot mutex (vsg:1253)
        self._stop = threading.Event()

        self._build_processors()

        self.graph = StreamGraph()
        self.packet_mode = self._decide_packet_mode(packet_mode, sink)
        if self.packet_mode:
            self._build_packet_graph()
        else:
            self._build_frame_graph(sink)

        self.tcp: Optional[TcpReceiver] = \
            TcpReceiver(tcp_port).start() if enable_tcp else None
        self.rest: Optional[ConfigRestServer] = None
        if enable_rest and config_path:
            self.rest = ConfigRestServer(config_path, rest_port).start()
        self.watcher: Optional[ConfigWatcher] = None
        if config_path:
            self.watcher = ConfigWatcher(config_path, self._on_config_change)

        self._frames_out = 0
        self._tracker = None
        if self.cfg.mode.tracker_enabled:
            from video_stab_tpu.models.tracker import ObjectTracker
            self._tracker = ObjectTracker(self.cfg.tracker)

    # -- graph construction -------------------------------------------------
    def _decide_packet_mode(self, packet_mode: Optional[bool],
                            sink) -> bool:
        """Packet (compressed-domain) mode: the production passthrough path
        relays H.264 access units byte-identically with NO decoder, exactly
        like the reference's gstd/interpipe graph (GstdManager.cpp:155-229;
        passthrough adds 10-20 ms vs 50-100 ms for decode+re-encode,
        README_GSTD_INTERPIPE.md:157-158). Auto-on when both endpoints are
        packet-capable: source is an Annex-B .h264 file or an rtsp:// URL,
        output is .h264 / rtsp:// / null, and the native codec is present
        (processing mode needs the decoder+encoder)."""
        if packet_mode is not None:
            return packet_mode
        if sink is not None:
            return False
        from video_stab_tpu.io.codec import available
        src = self.cfg.video_source
        out = self.cfg.output_source
        container_codec = None
        src_ok = (src.endswith((".h264", ".264", ".h265", ".265", ".hevc"))
                  or src.startswith("rtsp://"))
        if not src_ok and src.endswith((".mp4", ".m4v", ".mkv", ".mov")):
            # A container is only packet-capable when its video stream is
            # H.264/HEVC — the packet graph speaks nothing else (the demux
            # BSF falls back to "null" for other codecs and the relay
            # would ship undecodable bytes under an H264 announcement).
            # One header-only demux open answers this; anything else
            # (VP9/AV1/MPEG-4...) takes the frame graph, which cv2
            # decodes fine.
            try:
                from video_stab_tpu.io.codec import ContainerDemuxer
                d = ContainerDemuxer(src)
                container_codec = d.codec_name
                src_ok = container_codec in ("h264", "hevc", "h265")
                d.close()
            except Exception:
                src_ok = False
        if not src_ok:
            return False
        out_ok = (not out or out == "null"
                  or out.endswith((".h264", ".264", ".h265", ".265", ".hevc",
                                   ".mp4", ".m4v", ".mkv", ".mov"))
                  or out.startswith("rtsp://"))
        enc_ok = available("libx264")
        if src.endswith((".h265", ".265", ".hevc")) \
                or container_codec in ("hevc", "h265") \
                or out.endswith((".h265", ".265", ".hevc")):
            # An HEVC stream stays HEVC through processing (the sink's
            # rtpmap/mux and the encoder bridge are codec-threaded), so
            # the packet route additionally needs the HEVC encoder; a
            # libx264-only build would die mid-run at switch_processing()
            # where the frame graph works fine.
            enc_ok = enc_ok and available("libx265")
        return src_ok and out_ok and enc_ok

    def _build_frame_graph(self, sink) -> None:
        """Decoded-frame graph (the vsg.cpp appsink/appsrc route)."""
        self.source = open_source(
            self.cfg.video_source,
            SourceParams(source=self.cfg.video_source,
                         **{k: getattr(self.cfg.camera, k)
                            for k in ("threaded_queue_mode", "colorspace",
                                      "logging", "queue_size")}))
        self.sink = sink if sink is not None else open_sink(
            self.cfg.output_source)
        self.graph.add_pipeline("source", source=self.source,
                                publish_to="source")
        self.graph.add_pipeline("processing", listen_to="source",
                                processor=self._process_frame,
                                publish_to="processed")
        self.graph.add_pipeline("output",
                                listen_to=self._initial_route(),
                                sink=self.sink)

    def _build_packet_graph(self) -> None:
        """Compressed-domain graph: access units ride lossless channels; the
        output pipeline's listen-to flips between the byte-identical
        "source_pkt" relay and the decoded->processed->re-encoded
        "processed_pkt" stream (GstdManager.cpp:155-229, 324-327;
        vsg.cpp:418-525)."""
        from video_stab_tpu.io.packets import (PacketDecoderBridge,
                                               PacketEncoderBridge,
                                               open_packet_sink,
                                               open_packet_source)
        src = self.cfg.video_source
        fps = int(getattr(self.cfg.camera, "fps", 30) or 30)
        # File sources are paced at the stream rate: the graph models a
        # LIVE relay (hot mode switches happen mid-stream, not after an
        # instant drain of the whole file). Container ingest stays
        # compressed too (native demux + mp4toannexb — the reference's
        # qtdemux stage).
        self.source = open_packet_source(src, realtime_fps=fps)
        # The sink must speak the SOURCE's codec (an HEVC camera relayed
        # through an H264-announcing RTSP sink would hand every client an
        # undecodable stream); codec_name is known once the source is up
        # (SDP rtpmap / container codec id / extension).
        if hasattr(self.source, "start"):
            self.source.start()
        src_codec = getattr(self.source, "codec_name", "") or "h264"
        sink_codec = "h265" if src_codec in ("hevc", "h265") else "h264"
        self.sink = open_packet_sink(
            self.cfg.output_source, fps=fps, codec=sink_codec)
        self._pkt_decoder = PacketDecoderBridge()
        # The re-encode branch must emit the codec the sink announces —
        # processed HEVC stays HEVC end to end (ADVICE r3).
        self._pkt_encoder = PacketEncoderBridge(fps=fps, codec=sink_codec)
        self._pkt_wait_idr = True
        self._pkt_active = self._initial_route() == "processed"
        # Lossless ordered channels (Channel depth > 1): dropping an access
        # unit would break the decode chain and byte-identity.
        self.graph.channel("source_pkt").depth = 256
        self.graph.channel("processed_pkt").depth = 256
        self.graph.add_pipeline("source", source=self.source,
                                publish_to="source_pkt")
        self.graph.add_pipeline("processing", listen_to="source_pkt",
                                processor=self._process_packet,
                                publish_to="processed_pkt")
        self.graph.add_pipeline(
            "output",
            listen_to="processed_pkt" if self._pkt_active else "source_pkt",
            sink=self.sink)
        self._apply_packet_output_format()

    def _apply_packet_output_format(self) -> None:
        """Packet graph: the fused chain's only consumer is the encoder
        bridge, so fold the BT.601 I420 conversion into the device program
        (half the device->host payload, no host swscale pass —
        native/codec.cpp vs_enc_encode_yuv). BGR is kept when a tracker
        overlay must draw on the decoded frames."""
        if (getattr(self, "packet_mode", False) and self.chain is not None
                and not self.cfg.mode.tracker_enabled):
            self.chain = self.chain.with_output_format("i420")

    @property
    def decoder_constructed(self) -> bool:
        """True once the packet graph has EVER instantiated its decoder —
        stays False over a pure passthrough run (the reference's no-decoder
        guarantee for passthrough mode). Sticky across stop() so it can be
        asserted post-run."""
        return self.packet_mode and self._pkt_decoder.ever_constructed

    def _process_packet(self, au):
        """Processing branch of the packet graph. In passthrough it drops
        units WITHOUT decoding (the decoder is never constructed); when
        processing is switched on mid-stream it waits for the next IDR,
        attaches the decoder, runs the frame chain, and re-encodes."""
        if not self._pkt_active:
            self._pkt_wait_idr = True
            return None
        from video_stab_tpu.io.codec import is_irap
        src_codec = getattr(self.source, "codec_name", "") or "h264"
        is_hevc = src_codec in ("hevc", "h265")
        if is_hevc and not self._pkt_decoder.decoder_constructed:
            self._pkt_decoder.codec = "hevc"
        if self._pkt_wait_idr:
            if not any(is_irap(n, src_codec) for n in au):
                return None         # resume at the next gop boundary
            self._pkt_wait_idr = False
        out_nals = []
        for frame in self._pkt_decoder.decode_unit(au):
            out = self._process_frame(frame)
            if out is None:
                continue
            # Dispatch on the frame's own layout — device-emitted planar
            # I420 is 2-D (H*3/2, W), BGR is 3-D. Keying on the array
            # (not self.chain) keeps this consistent with whatever chain
            # produced it even if a hot reload swaps the chain between
            # this read and _process_frame's snapshot.
            if out.ndim == 2:
                # Planar I420 goes straight into libx264 (no host
                # swscale; half the D2H payload).
                nals = self._pkt_encoder.encode_frame_yuv(
                    np.ascontiguousarray(out))
            else:
                nals = self._pkt_encoder.encode_frame(
                    np.ascontiguousarray(out[:, :, :3]))
            if nals:
                out_nals.extend(nals)
        return out_nals or None

    # -- config / processors ----------------------------------------------
    def _build_processors(self):
        m = self.cfg.mode
        self.chain = None
        if self.fused and (m.enhancer_enabled or m.roll_correction_enabled or
                           m.stabilizer_enabled):
            # One fused XLA program for the device-side chain
            # (core/chain.py) — one host<->HBM round trip per frame.
            self.chain = ProcessingChain(
                m, self.cfg.enhancer, self.cfg.roll_correction,
                self.cfg.stabilizer, azc=self.cfg.auto_zoom_crop,
                fuse_roll=getattr(self.cfg, "roll_fusion", True))
            # azc runs INSIDE the fused chain (paired with roll correction,
            # roll-correction-file.cpp:61-68, gated by auto_zoom_crop.enabled).
            self.enhancer = self.roll = self.stabilizer = self.azc = None
            return
        self.enhancer = Enhancer(self.cfg.enhancer) if m.enhancer_enabled \
            else None
        self.roll = RollCorrection(self.cfg.roll_correction) \
            if m.roll_correction_enabled else None
        self.azc = AutoZoomCrop(self.cfg.auto_zoom_crop) \
            if (m.roll_correction_enabled and
                self.cfg.auto_zoom_crop.enabled) else None
        self.stabilizer = Stabilizer(self.cfg.stabilizer) \
            if m.stabilizer_enabled else None

    def _initial_route(self) -> str:
        """Passthrough iff every processing toggle is off
        (vsg.cpp:1228-1233, 1321-1327)."""
        m = self.cfg.mode
        processing = (m.enhancer_enabled or m.roll_correction_enabled or
                      m.stabilizer_enabled or m.tracker_enabled)
        return "processed" if processing else "source"

    def _on_config_change(self, new_cfg: AppConfig):
        """Hot reload: swap params + recreate the Stabilizer + switch mode
        (vsg.cpp:1346-1415)."""
        self.log.info("config changed; reloading")
        with self._lock:
            self.cfg = new_cfg
            self._build_processors()
            self._apply_packet_output_format()
            if new_cfg.mode.tracker_enabled and self._tracker is None:
                from video_stab_tpu.models.tracker import ObjectTracker
                self._tracker = ObjectTracker(new_cfg.tracker)
            elif not new_cfg.mode.tracker_enabled:
                # Disabling the tracker must also drop the instance: the
                # overlay gate in _process_frame keys on `_tracker is not
                # None`, and the packet chain may have just switched to
                # i420 output (no BGR frames to draw on).
                if self._tracker is not None:
                    self._tracker.release()    # join its async thread
                self._tracker = None
        if self._initial_route() == "processed":
            self.switch_processing()
        else:
            self.switch_passthrough()
        self.metrics.inc("config_reloads")

    # -- per-frame chain (vsg.cpp:1246-1313) -------------------------------
    def _process_frame(self, frame: np.ndarray) -> Optional[np.ndarray]:
        with self._lock:                      # snapshot under mutex
            chain = self.chain
            enhancer, roll, azc = self.enhancer, self.roll, self.azc
            stab, tracker = self.stabilizer, self._tracker
        t = self.metrics.timer
        if chain is not None:
            with t.stage("fused_chain"):
                out = chain.process(frame)
            if out is None:
                self.metrics.inc("warmup_frames")
                return None
            frame = out
            if tracker is not None:
                with t.stage("track"):
                    dets = tracker.process_frame(frame)
                    sel = self.tcp.try_get_latest() if self.tcp else None
                    frame = tracker.draw_detections(
                        frame, dets, *(sel or (-1, -1)))
            self.metrics.fps.tick()
            self.metrics.inc("frames_out")
            self._frames_out += 1
            return frame
        if enhancer is not None:
            with t.stage("enhance"):
                frame = enhancer.enhance(frame)
        if roll is not None:
            with t.stage("roll"):
                frame = roll.auto_correct_roll(frame)
            if azc is not None:
                # Remove the rotation's borders (roll-correction-file.cpp:
                # 61-68); config-gated by auto_zoom_crop.enabled.
                with t.stage("auto_zoom_crop"):
                    frame = azc.auto_zoom_crop(frame)
        if stab is not None:
            with t.stage("stabilize"):
                out = stab.stabilize(frame)
            if out is None:
                self.metrics.inc("warmup_frames")
                return None
            frame = out
            met = stab.last_metrics
            # Metrics live on-device; syncing them per frame would stall the
            # async dispatch pipeline. Fetch at reporting cadence only (the
            # reference prints every 30 frames, DeepStreamTracker.cpp:119).
            if met and self._frames_out % 30 == 0:
                self.metrics.set("n_tracked", float(np.asarray(
                    met.get("n_tracked", 0))))
                self.metrics.set("n_inliers", float(np.asarray(
                    met.get("n_inliers", 0))))
        if tracker is not None:
            with t.stage("track"):
                dets = tracker.process_frame(frame)
                sel = self.tcp.try_get_latest() if self.tcp else None
                if sel:
                    frame = tracker.draw_detections(frame, dets, *sel)
                else:
                    frame = tracker.draw_detections(frame, dets)
        self.metrics.fps.tick()
        self.metrics.inc("frames_out")
        self._frames_out += 1
        return frame

    # -- interactive controls (vsg.cpp:1426-1451) ---------------------------
    def switch_passthrough(self):
        if self.packet_mode:
            self._pkt_active = False
            self.graph.set_listen_to("output", "source_pkt")
        else:
            self.graph.set_listen_to("output", "source")

    def switch_processing(self):
        if self.packet_mode:
            self._pkt_wait_idr = True     # decoder attaches at the next IDR
            # Point the output at the processed channel BEFORE activating
            # the re-encode branch: the listen_to setter captures the join
            # cursor at call time, so ordering this first guarantees the
            # branch's first emitted unit (SPS/PPS+IDR) is delivered even
            # if it publishes before the output thread's next iteration.
            self.graph.set_listen_to("output", "processed_pkt")
            self._pkt_active = True
        else:
            self.graph.set_listen_to("output", "processed")

    def print_status(self):
        import json
        print(json.dumps({"pipelines": self.graph.pipeline_list(),
                          "metrics": self.metrics.snapshot()},
                         indent=2, default=str))

    # -- lifecycle ---------------------------------------------------------
    def start(self):
        self.source.start()
        self.graph.start()
        if self.watcher:
            self.watcher.start()
        self.keyboard = KeyboardController(
            self.switch_passthrough, self.switch_processing,
            self.print_status, self._stop.set).start()
        return self

    def run(self, duration: float = 0.0):
        """Block until duration (s) elapses, max_frames reached, or stop()."""
        self.start()
        t0 = time.monotonic()
        try:
            while not self._stop.is_set():
                if duration and time.monotonic() - t0 >= duration:
                    break
                if self.max_frames and self._frames_out >= self.max_frames:
                    break
                time.sleep(0.05)
        finally:
            self.stop()

    def stop(self):
        self._stop.set()
        if getattr(self, "keyboard", None):
            self.keyboard.stop()
        if self.watcher:
            self.watcher.stop()
        if self.tcp:
            self.tcp.stop()
        if self.rest:
            self.rest.stop()
        if getattr(self, "chain", None) is not None \
                and getattr(self, "sink", None) is not None \
                and not self.packet_mode:    # packet sinks take AUs, and
                                             # the packet graph is a live
                                             # relay (no end-of-file drain)
            # Drain the stabilizer's look-ahead queue into the sink before
            # the graph closes it — a finite stream otherwise loses its
            # last effective_radius frames (Stabilizer.cpp:394-400 flush).
            # Pipeline worker threads stop first so the drain's writes
            # can't interleave with the output pipeline's.
            for p_ in self.graph._pipelines.values():
                p_.stop()
            try:
                while (o := self.chain.flush()) is not None:
                    self.sink.write(o)
                    self._frames_out += 1
            except Exception:
                pass        # sink already closed by a racing shutdown
        self.graph.stop()
        if self.packet_mode:
            self._pkt_decoder.close()
            self._pkt_encoder.close()
        if self._tracker is not None:
            self._tracker.release()


def run_app(config_path: str, **kw) -> StabilizerApp:
    cfg = load_config(config_path)
    return StabilizerApp(cfg, config_path=config_path, **kw)
