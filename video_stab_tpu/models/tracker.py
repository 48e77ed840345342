"""Multi-object tracker — the nvtracker(NvDCF) + drawDetections counterpart.

Mirrors vs::DeepStreamTracker's public surface (include/video/
DeepStreamTracker.h:22-97): ``Parameters``, ``Detection{class_id, confidence,
bbox, track_id, label}``, ``process_frame() -> detections`` (async,
latest-only queue returning the PREVIOUS result immediately,
DeepStreamTracker.cpp:74-131), ``draw_detections`` with sticky click
selection, and ``pick_id_at``.

Track association is NvDCF-flavored: per-track constant-velocity Kalman on
(cx, cy, w, h) + greedy IoU matching + tentative/lost age management. The
detector inference is the JAX CenterNet model (video_stab_tpu.models.
detector) — batched and jitted; the association bookkeeping is host-side
Python (tiny, branch-heavy — the wrong shape for the VPU by design).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import List, Optional, Sequence

import numpy as np

from video_stab_tpu.models.detector import (
    DetectorConfig,
    TRAFFICCAMNET_LABELS,
    create_detector,
    detect,
)


@dataclasses.dataclass
class Detection:
    """DeepStreamTracker.h:66-72."""

    class_id: int
    confidence: float
    bbox: tuple            # (x, y, w, h) in processing-resolution pixels
    track_id: int = -1
    label: str = ""


@dataclasses.dataclass(frozen=True)
class TrackerParams:
    """DeepStreamTracker::Parameters (h:22-64), minus the TensorRT/
    DeepStream file paths (the model is in-process here)."""

    processing_width: int = 640
    processing_height: int = 384
    batch_size: int = 1
    enable_low_latency: bool = True
    debug_mode: bool = False
    confidence_threshold: float = 0.5
    max_tracked_objects: int = 100
    labels: Sequence[str] = TRAFFICCAMNET_LABELS
    # Association knobs (NvDCF-config equivalents)
    iou_threshold: float = 0.3
    max_lost_age: int = 10        # frames a track survives unmatched
    min_hits: int = 2             # detections before a track is confirmed


def _iou(a, b):
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    x1, y1 = max(ax, bx), max(ay, by)
    x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def _iom(a, b):
    """Intersection over the SMALLER box's area (fragment containment)."""
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    x1, y1 = max(ax, bx), max(ay, by)
    x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    smaller = min(aw * ah, bw * bh)
    return inter / smaller if smaller > 0 else 0.0


class _Track:
    """Constant-velocity Kalman on (cx, cy, w, h)."""

    def __init__(self, tid, det: Detection):
        x, y, w, h = det.bbox
        self.x = np.array([x + w / 2, y + h / 2, w, h, 0.0, 0.0], np.float64)
        self.p = np.eye(6) * 10.0
        self.tid = tid
        self.class_id = det.class_id
        self.class_votes = {det.class_id: 1}
        self.confidence = det.confidence
        self.hits = 1
        self.age = 0
        self.lost = 0

    def predict(self):
        self.x[0] += self.x[4]
        self.x[1] += self.x[5]
        # F P F^T + Q for the block-diagonal CV model
        f = np.eye(6)
        f[0, 4] = f[1, 5] = 1.0
        self.p = f @ self.p @ f.T + np.eye(6) * 0.1
        self.age += 1
        self.lost += 1

    def update(self, det: Detection):
        x, y, w, h = det.bbox
        z = np.array([x + w / 2, y + h / 2, w, h], np.float64)
        hm = np.zeros((4, 6))
        hm[:4, :4] = np.eye(4)
        s = hm @ self.p @ hm.T + np.eye(4) * 1.0
        k = self.p @ hm.T @ np.linalg.inv(s)
        self.x = self.x + k @ (z - hm @ self.x)
        self.p = (np.eye(6) - k @ hm) @ self.p
        self.confidence = det.confidence
        # Sticky class: a partially-occluded object is routinely
        # misclassified frame-to-frame (a car's visible sliver reads as
        # another class); majority vote keeps the identity's label from
        # flapping with each fragment detection.
        self.class_votes[det.class_id] = \
            self.class_votes.get(det.class_id, 0) + 1
        if self.class_votes[det.class_id] > \
                self.class_votes.get(self.class_id, 0):
            self.class_id = det.class_id
        self.hits += 1
        self.lost = 0

    def touch(self, det: Detection):
        """Fragment (second-chance) match: identity evidence ONLY. The
        fragment box measures the visible sliver, not the object — feeding
        it to the Kalman collapses the track's extent and drags its center
        to the occluder edge, after which the real re-emergence can't
        associate. Keep coasting the motion model; just keep the identity
        alive (NvDCF shadow-track semantics)."""
        self.class_votes[det.class_id] = \
            self.class_votes.get(det.class_id, 0) + 1
        self.lost = 0

    @property
    def bbox(self):
        cx, cy, w, h = self.x[:4]
        return (float(cx - w / 2), float(cy - h / 2), float(w), float(h))


class ObjectTracker:
    """In-process detection + tracking with the reference's async contract:
    ``process_frame`` enqueues (latest-only) and returns the PREVIOUS
    detections immediately (DeepStreamTracker.cpp:98-118)."""

    def __init__(self, params: Optional[TrackerParams] = None,
                 detector_cfg: Optional[DetectorConfig] = None,
                 detector_params=None, async_mode: bool = True):
        self.params = params or TrackerParams()
        cfg = detector_cfg or DetectorConfig(
            num_classes=len(self.params.labels),
            max_detections=self.params.max_tracked_objects)
        self._model, self._dp = create_detector(
            cfg, height=self.params.processing_height,
            width=self.params.processing_width)
        if detector_params is not None:
            self._dp = detector_params
        self._cfg = cfg
        self._tracks: List[_Track] = []
        self._next_id = 1
        self._latest: List[Detection] = []
        self._lock = threading.Lock()
        self._selected_id = -1
        self._frame_count = 0
        self._total_ms = 0.0
        self._async = async_mode
        self._queue: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._thread = None
        if async_mode:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    # -- inference + association ------------------------------------------
    def _infer(self, frame: np.ndarray) -> List[Detection]:
        import cv2
        p = self.params
        resized = cv2.resize(frame, (p.processing_width, p.processing_height))
        t0 = time.perf_counter()
        out = detect(self._model, self._dp,
                     resized[None].astype(np.float32),
                     p.confidence_threshold, self._cfg.max_detections)
        dets = []
        valid = np.asarray(out["valid"][0])
        cls = np.asarray(out["class_id"][0])
        score = np.asarray(out["score"][0])
        bbox = np.asarray(out["bbox"][0])
        for i in np.nonzero(valid)[0]:
            c = int(cls[i])
            dets.append(Detection(
                class_id=c, confidence=float(score[i]),
                bbox=tuple(float(v) for v in bbox[i]),
                label=p.labels[c] if c < len(p.labels) else str(c)))
        self._total_ms += (time.perf_counter() - t0) * 1e3
        self._frame_count += 1
        return self._associate(dets)

    def _associate(self, dets: List[Detection]) -> List[Detection]:
        for t in self._tracks:
            t.predict()
        unmatched = list(range(len(dets)))
        pairs = []
        for ti, t in enumerate(self._tracks):
            best, best_iou = -1, self.params.iou_threshold
            for di in unmatched:
                iou = _iou(t.bbox, dets[di].bbox)
                if iou > best_iou:
                    best, best_iou = di, iou
            if best >= 0:
                pairs.append((ti, best))
                unmatched.remove(best)
        # Second chance for unmatched tracks: an object re-emerging from
        # behind an occluder is detected as a FRAGMENT (the visible sliver
        # at the occluder's edge), whose IoU with the full-size predicted
        # box stays far below iou_threshold even when the coasted
        # prediction is spot-on — so the primary pass would mint a fresh
        # identity mid-occlusion. Class-gated fragment containment
        # (intersection over the smaller area) re-locks the existing
        # track instead: the IoU analogue of NvDCF shadow-track
        # re-association (DeepStreamTracker.h:46-52).
        matched = {ti for ti, _ in pairs}
        frag_pairs = []
        for ti, t in enumerate(self._tracks):
            if ti in matched or not unmatched:
                continue
            best, best_iom = -1, 0.5
            for di in unmatched:
                # No class gate here: fragments routinely misclassify
                # (the sliver of a car emerging past an occluder edge
                # reads as another class), and the track's own class is
                # majority-voted, so one fragment can't relabel it.
                iom = _iom(t.bbox, dets[di].bbox)
                if iom > best_iom:
                    best, best_iom = di, iom
            if best >= 0:
                frag_pairs.append((ti, best))
                unmatched.remove(best)
        for ti, di in pairs:
            self._tracks[ti].update(dets[di])
        for ti, di in frag_pairs:
            self._tracks[ti].touch(dets[di])
        for di in unmatched:
            self._tracks.append(_Track(self._next_id, dets[di]))
            self._next_id += 1
        self._tracks = [t for t in self._tracks
                        if t.lost <= self.params.max_lost_age]
        out = []
        for t in self._tracks:
            if t.hits >= self.params.min_hits and t.lost == 0:
                out.append(Detection(
                    class_id=t.class_id, confidence=t.confidence,
                    bbox=t.bbox, track_id=t.tid,
                    label=self.params.labels[t.class_id]
                    if t.class_id < len(self.params.labels)
                    else str(t.class_id)))
        return out

    def _loop(self):
        while not self._stop.is_set():
            try:
                frame = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            result = self._infer(frame)
            with self._lock:
                self._latest = result

    # -- public surface (DeepStreamTracker.h:74-92) ------------------------
    def process_frame(self, frame: np.ndarray) -> List[Detection]:
        """Async: enqueue latest-only, return previous detections now."""
        if not self._async:
            result = self._infer(frame)
            with self._lock:
                self._latest = result
            return list(result)
        try:
            self._queue.put_nowait(frame)
        except queue.Full:          # drop oldest (latest-only queue)
            try:
                self._queue.get_nowait()
            except queue.Empty:
                pass
            try:
                self._queue.put_nowait(frame)
            except queue.Full:
                pass
        with self._lock:
            return list(self._latest)

    def draw_detections(self, frame: np.ndarray,
                        detections: Sequence[Detection],
                        sel_x: int = -1, sel_y: int = -1) -> np.ndarray:
        """Draw boxes + labels, sticky-selecting the track under
        (sel_x, sel_y) (drawDetections, DeepStreamTracker.cpp:139-295)."""
        import cv2
        out = frame.copy()
        h, w = frame.shape[:2]
        sx = w / self.params.processing_width
        sy = h / self.params.processing_height
        if sel_x >= 0 and sel_y >= 0:
            picked = self.pick_id_at(sel_x, sel_y, (w, h))
            if picked >= 0:
                self._selected_id = picked
        for d in detections:
            x, y, bw, bh = d.bbox
            p1 = (int(x * sx), int(y * sy))
            p2 = (int((x + bw) * sx), int((y + bh) * sy))
            selected = d.track_id == self._selected_id
            color = (0, 0, 255) if selected else (0, 255, 0)
            cv2.rectangle(out, p1, p2, color, 2 if selected else 1)
            cv2.putText(out, f"{d.label} {d.track_id}",
                        (p1[0], max(p1[1] - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
        if self._frame_count:
            fps = 1000.0 * self._frame_count / max(self._total_ms, 1e-3)
            cv2.putText(out, f"FPS: {fps:.1f}", (10, 20),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 0), 1)
        return out

    def pick_id_at(self, x: int, y: int,
                   frame_size: Optional[tuple] = None) -> int:
        """Track id under display-space point (pickIdAt,
        DeepStreamTracker.cpp)."""
        sx = sy = 1.0
        if frame_size is not None:
            sx = self.params.processing_width / frame_size[0]
            sy = self.params.processing_height / frame_size[1]
        with self._lock:
            dets = list(self._latest)
        for d in dets:
            bx, by, bw, bh = d.bbox
            if bx <= x * sx <= bx + bw and by <= y * sy <= by + bh:
                return d.track_id
        return -1

    def release(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass
