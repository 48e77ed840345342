"""Learned-component tests: detector decode, tracker association, training
convergence (tiny shapes — CPU CI)."""

import numpy as np
import pytest

from video_stab_tpu.models.detector import DetectorConfig, create_detector, detect
from video_stab_tpu.models.tracker import Detection, ObjectTracker, TrackerParams


class TestDetector:
    def test_forward_and_decode_shapes(self):
        cfg = DetectorConfig(max_detections=16)
        model, params = create_detector(cfg, height=64, width=96)
        frames = np.zeros((2, 64, 96, 3), np.float32)
        out = detect(model, params, frames, 0.5, 16)
        assert out["class_id"].shape == (2, 16)
        assert out["bbox"].shape == (2, 16, 4)
        assert out["valid"].dtype == bool


class TestTrackerAssociation:
    def _tracker(self):
        return ObjectTracker(TrackerParams(processing_width=96,
                                           processing_height=64,
                                           min_hits=1),
                             async_mode=False)

    def test_track_ids_persist(self):
        tr = self._tracker()
        d0 = [Detection(0, 0.9, (10, 10, 20, 20)),
              Detection(1, 0.8, (60, 30, 15, 15))]
        out0 = tr._associate(list(d0))
        ids0 = {d.bbox[0] // 10: d.track_id for d in out0}
        # slight motion: same objects
        d1 = [Detection(0, 0.9, (12, 11, 20, 20)),
              Detection(1, 0.8, (62, 31, 15, 15))]
        out1 = tr._associate(list(d1))
        assert len(out1) == 2
        ids1 = {d.bbox[0] // 10: d.track_id for d in out1}
        assert set(ids0.values()) == set(ids1.values())
        tr.release()

    def test_track_dies_after_max_lost(self):
        tr = self._tracker()
        tr._associate([Detection(0, 0.9, (10, 10, 20, 20))])
        for _ in range(tr.params.max_lost_age + 1):
            tr._associate([])
        assert len(tr._tracks) == 0
        tr.release()

    def test_pick_id_at(self):
        tr = self._tracker()
        dets = tr._associate([Detection(0, 0.9, (10, 10, 20, 20))])
        tr._latest = dets
        assert tr.pick_id_at(15, 15) == dets[0].track_id
        assert tr.pick_id_at(90, 60) == -1
        tr.release()

    def test_draw_detections(self):
        tr = self._tracker()
        dets = tr._associate([Detection(0, 0.9, (10, 10, 20, 20))])
        frame = np.zeros((64, 96, 3), np.uint8)
        out = tr.draw_detections(frame, dets)
        assert out.shape == frame.shape
        assert out.sum() > 0       # something was drawn
        tr.release()


class TestTraining:
    def test_detector_loss_decreases(self):
        from video_stab_tpu.models.train import train_detector

        _, _, losses = train_detector(n_steps=8, batch=2, height=32,
                                      width=48, log_every=0)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
