"""Per-frame transform parity vs the reference legacy algorithm (BASELINE
config 1: "parity vs Stabilizer_legacy" — the deterministic, RANSAC-free
path, SURVEY.md §4b).

Oracle: the legacy pipeline re-executed with OpenCV's own primitives
(cv2.goodFeaturesToTrack + cv2.calcOpticalFlowPyrLK + median outlier
rejection + closed-form rigid solve + shake damping + centered box
smoothing — the exact algorithm of src/Stabilizer_legacy.cpp:108-434).
Our LegacyStabilizer replaces each primitive with its JAX counterpart, so
parity is asserted on the per-frame (dx, dy) corrections within sub-pixel
tolerance, not bitwise.
"""

import cv2
import numpy as np
import pytest

from video_stab_tpu import LegacyStabilizer, LegacyStabilizerParams


def make_clip(n=14, h=120, w=160, seed=3):
    rng = np.random.default_rng(seed)
    world = (cv2.GaussianBlur(
        rng.random((h + 80, w + 80)).astype(np.float32), (0, 0), 1.8) * 255)
    frames, offs = [], []
    for _ in range(n):
        dx, dy = rng.normal(0.0, 1.5, 2)
        x0, y0 = 40 + dx, 40 + dy
        m = np.float32([[1, 0, -x0], [0, 1, -y0]])
        f = cv2.warpAffine(world, m, (w, h))
        frames.append(np.repeat(f[:, :, None], 3, 2).astype(np.uint8))
        offs.append((x0, y0))
    return frames, offs


class CV2LegacyOracle:
    """Stabilizer_legacy.cpp re-executed on cv2 primitives."""

    def __init__(self, p: LegacyStabilizerParams):
        self.p = p
        self.prev_gray = None
        self.prev_pts = None
        self.transforms = []
        self.path = []

    def _detect(self, gray):
        pts = cv2.goodFeaturesToTrack(
            gray, self.p.max_corners, self.p.quality_level,
            self.p.min_distance, blockSize=self.p.block_size)
        if pts is None:
            return np.zeros((0, 2), np.float32)
        pts = pts.reshape(-1, 2)
        m = self.p.feature_border_margin
        h, w = gray.shape
        keep = ((pts[:, 0] > m) & (pts[:, 1] > m) &
                (pts[:, 0] < w - m) & (pts[:, 1] < h - m))
        return pts[keep]

    def push(self, frame):
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if self.prev_gray is None:
            self.prev_gray = gray
            self.prev_pts = self._detect(gray)
            return
        p = self.p
        curr, status, err = cv2.calcOpticalFlowPyrLK(
            self.prev_gray, gray, self.prev_pts.reshape(-1, 1, 2), None,
            winSize=(p.lk_window, p.lk_window), maxLevel=p.lk_levels,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                      p.lk_iters, p.lk_eps))
        curr = curr.reshape(-1, 2)
        good = (status.reshape(-1) > 0) & (err.reshape(-1) < p.lk_err_threshold)
        gp, gc = self.prev_pts[good], curr[good]
        if len(gp) < p.min_tracking_features:
            t = np.zeros(3, np.float32)
        else:
            # median outlier rejection (legacy:283-321)
            mo = gc - gp
            med = np.array([np.sort(mo[:, 0])[len(mo) // 2],
                            np.sort(mo[:, 1])[len(mo) // 2]])
            d = np.linalg.norm(mo - med, axis=1)
            keep = d <= p.outlier_threshold
            if keep.sum() >= 10:
                gp, gc = gp[keep], gc[keep]
            # closed-form rigid (legacy:323-358)
            cp, cc = gp.mean(0), gc.mean(0)
            pc, qc = gp - cp, gc - cc
            num = float(np.sum(pc[:, 0] * qc[:, 1] - pc[:, 1] * qc[:, 0]))
            den = float(np.sum(pc[:, 0] * qc[:, 0] + pc[:, 1] * qc[:, 1]))
            da = np.arctan2(num, den) if abs(den) > 1e-6 else 0.0
            t = np.float32([cc[0] - cp[0], cc[1] - cp[1], da])
            # shake damping (legacy:360-378)
            if (np.hypot(t[0], t[1]) < p.shake_threshold_px and
                    abs(t[2]) < p.rotation_shake_rad):
                t = t * p.shake_damping_factor
        self.transforms.append(t)
        self.path.append((self.path[-1] if self.path else 0) + t)
        self.prev_pts = curr[status.reshape(-1) > 0]
        self.prev_gray = gray

    def corrections(self):
        """smoothed - path with the legacy centered box (legacy:412-434)."""
        path = np.array(self.path)
        r = self.p.box_radius
        n = len(path)
        sm = np.array([
            path[max(0, i - r):min(n - 1, i + r) + 1].mean(0)
            for i in range(n)])
        return sm - path


@pytest.mark.parametrize("seed", [3, 11])
def test_legacy_transform_parity_vs_cv2_oracle(seed):
    frames, _ = make_clip(seed=seed)
    p = LegacyStabilizerParams(smoothing_radius=8, max_corners=120,
                               min_distance=8.0, min_tracking_features=10)
    ours = LegacyStabilizer(p)
    oracle = CV2LegacyOracle(p)
    for f in frames:
        ours.stabilize(f)
        oracle.push(f)

    ring = np.asarray(ours._state.path_ring)
    n = int(ours._state.n_path)
    our_path = np.array([ring[i % ring.shape[0]] for i in range(n)])
    ref_path = np.array(oracle.path)
    assert len(our_path) == len(ref_path)

    # Per-frame path parity: sub-pixel translation, milliradian rotation.
    dt = np.abs(our_path[:, :2] - ref_path[:, :2])
    da = np.abs(our_path[:, 2] - ref_path[:, 2])
    assert dt.max() < 0.5, dt.max()
    assert da.max() < 5e-3, da.max()

    # Emitted-correction parity through the smoothing stage.
    ref_corr = oracle.corrections()
    from video_stab_tpu.motion.filters import box_filter_emit
    import jax.numpy as jnp
    r = p.box_radius
    for e in range(n):
        sm = np.asarray(box_filter_emit(
            jnp.asarray(ring), jnp.int32(n), jnp.int32(e),
            jnp.int32(r), r_max=max(r, 1)))
        our_corr = sm - our_path[e]
        assert np.abs(our_corr[:2] - ref_corr[e][:2]).max() < 0.5
