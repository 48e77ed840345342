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
                                               ("kalman", 0.7),
                                               ("l1", 0.2)])
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


class TestL1Path:
    def test_piecewise_linear_recovery(self):
        import jax.numpy as jnp
        from video_stab_tpu.motion import l1_smooth_path
        rng = np.random.default_rng(0)
        t = np.arange(120)
        base = np.where(t < 60, 0.0, (t - 60) * 0.5)   # static, then pan
        noisy = base + rng.normal(0, 2.0, 120)
        p = jnp.asarray(np.stack([noisy] * 3, 1).astype(np.float32))
        sm = np.asarray(l1_smooth_path(p, bound=jnp.asarray([8.0, 8.0, 8.0])))
        # jitter removed...
        assert np.abs(np.diff(sm[:, 0])).mean() < \
            np.abs(np.diff(noisy)).mean() * 0.25
        # ...within the crop-box constraint...
        assert np.abs(sm[:, 0] - noisy).max() <= 8.0 + 1e-3
        # ...and the static segment is near-constant
        assert sm[:55, 0].std() < noisy[:55].std() * 0.5
