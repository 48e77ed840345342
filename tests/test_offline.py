"""Offline (batch) stabilization tests."""

import cv2
import numpy as np
import pytest

from video_stab_tpu.core.params import StabilizerParams
from video_stab_tpu.offline import stabilize_clip

SMALL = dict(analysis_width=96, analysis_height=64, max_corners=32,
             ransac_hypotheses=32)


def _clip(n=16, seed=0):
    rng = np.random.default_rng(seed)
    world = (cv2.GaussianBlur(
        rng.random((160, 220)).astype(np.float32), (0, 0), 2) * 255)
    frames = []
    for _ in range(n):
        dx, dy = rng.normal(0, 2, 2)
        m = np.float32([[1, 0, -(30 + dx)], [0, 1, -(30 + dy)]])
        f = cv2.warpAffine(world, m, (96, 64))
        frames.append(np.repeat(f[:, :, None], 3, 2).astype(np.uint8))
    return np.stack(frames)


def _jitter(frames):
    d = [np.abs(a[8:-8, 8:-8].astype(np.float32) -
                b[8:-8, 8:-8].astype(np.float32)).mean()
         for a, b in zip(frames[:-1], frames[1:])]
    return float(np.mean(d))


class TestOffline:
    @pytest.mark.parametrize("method,factor", [("box", 0.3),
                                               ("gaussian", 0.3),
                                               ("kalman", 0.7)])
    def test_reduces_jitter(self, method, factor):
        clip = _clip()
        p = StabilizerParams(smoothing_radius=6, smoothing_method=method,
                             **SMALL)
        out = stabilize_clip(clip, p)
        assert out.shape == clip.shape and out.dtype == np.uint8
        assert _jitter(out) < _jitter(clip) * factor

    def test_border_and_crop(self):
        clip = _clip(n=10)
        p = StabilizerParams(smoothing_radius=5, border_size=8, **SMALL)
        out = stabilize_clip(clip, p)
        assert out.shape == (10, 64 + 16, 96 + 16, 3)
        p = StabilizerParams(smoothing_radius=5, border_size=8,
                             crop_n_zoom=True, **SMALL)
        out = stabilize_clip(clip, p)
        assert out.shape == clip.shape

    def test_non_chunk_multiple_length(self):
        clip = _clip(n=11)       # not a multiple of WARP_CHUNK
        p = StabilizerParams(smoothing_radius=5, **SMALL)
        out = stabilize_clip(clip, p)
        assert out.shape[0] == 11
