"""Motion estimation + trajectory filter tests: known ground truth and exact
equivalence with the reference's full-path algorithms (SURVEY.md §4b)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import video_stab_tpu.motion as motion
from video_stab_tpu.motion.filters import (
    box_filter_emit,
    gaussian_filter_emit,
    gaussian_kernel,
    kalman_step,
    ring_push,
)


def _make_points(n, seed=0):
    r = np.random.default_rng(seed)
    return (r.random((n, 2)) * 200.0).astype(np.float32)


def _apply_sim(pts, dx, dy, da, scale=1.0):
    a = scale * math.cos(da)
    b = scale * math.sin(da)
    x = a * pts[:, 0] - b * pts[:, 1] + dx
    y = b * pts[:, 0] + a * pts[:, 1] + dy
    return np.stack([x, y], axis=1).astype(np.float32)


class TestRansac:
    def test_recovers_exact_similarity(self):
        prev = _make_points(64)
        curr = _apply_sim(prev, 3.0, -2.0, 0.02)
        mask = np.ones(64, bool)
        m, ok, inl = motion.estimate_similarity_ransac(
            prev, curr, mask, jax.random.PRNGKey(0), n_hypotheses=128)
        m = np.asarray(m)
        assert bool(ok)
        assert np.allclose(m[0, 2], 3.0, atol=1e-3)
        assert np.allclose(m[1, 2], -2.0, atol=1e-3)
        assert np.allclose(np.arctan2(m[1, 0], m[0, 0]), 0.02, atol=1e-4)

    def test_robust_to_outliers(self):
        prev = _make_points(80, seed=1)
        curr = _apply_sim(prev, -4.0, 1.5, -0.01)
        r = np.random.default_rng(2)
        bad = r.choice(80, 24, replace=False)
        curr[bad] += r.normal(0, 40.0, (24, 2)).astype(np.float32)
        mask = np.ones(80, bool)
        m, ok, inl = motion.estimate_similarity_ransac(
            prev, curr, mask, jax.random.PRNGKey(1), n_hypotheses=256)
        m = np.asarray(m)
        assert bool(ok)
        assert np.allclose(m[0, 2], -4.0, atol=0.1)
        assert np.allclose(m[1, 2], 1.5, atol=0.1)
        assert np.asarray(inl).sum() >= 50

    def test_identity_when_too_few_points(self):
        prev = _make_points(16)
        curr = prev + 5.0
        mask = np.zeros(16, bool)
        mask[:3] = True
        m, ok, _ = motion.estimate_similarity_ransac(
            prev, curr, mask, jax.random.PRNGKey(2), n_hypotheses=32)
        assert not bool(ok)
        assert np.allclose(np.asarray(m), np.float32([[1, 0, 0], [0, 1, 0]]))

    def test_respects_mask(self):
        prev = _make_points(40, seed=3)
        curr = _apply_sim(prev, 2.0, 2.0, 0.0)
        curr[20:] = 999.0  # invalid slots poisoned
        mask = np.zeros(40, bool)
        mask[:20] = True
        m, ok, _ = motion.estimate_similarity_ransac(
            prev, curr, mask, jax.random.PRNGKey(3), n_hypotheses=128)
        assert bool(ok)
        assert np.allclose(np.asarray(m)[0, 2], 2.0, atol=1e-2)


class TestRigidClosedForm:
    def test_exact_on_clean_rigid(self):
        prev = _make_points(30, seed=4)
        curr = _apply_sim(prev, 1.25, -0.75, 0.015)
        t = np.asarray(motion.estimate_rigid_closed_form(
            prev, curr, np.ones(30, bool)))
        # centroid translation of a rotation about origin is not (dx,dy);
        # verify via re-application instead: the solve minimizes residual
        c_prev = prev.mean(0)
        c_curr = curr.mean(0)
        assert np.allclose(t[2], 0.015, atol=1e-4)
        assert np.allclose(t[0], c_curr[0] - c_prev[0], atol=1e-4)
        assert np.allclose(t[1], c_curr[1] - c_prev[1], atol=1e-4)

    def test_zero_when_too_few(self):
        prev = _make_points(8)
        mask = np.zeros(8, bool)
        mask[:2] = True
        t = np.asarray(motion.estimate_rigid_closed_form(prev, prev + 3, mask))
        assert np.allclose(t, 0.0)


class TestOutlierRejection:
    def test_median_rejection(self):
        prev = _make_points(40, seed=5)
        curr = prev + np.float32([2.0, 1.0])
        curr[5] += 100.0
        curr[11] -= 80.0
        mask = np.ones(40, bool)
        kept = np.asarray(motion.remove_outliers_median(prev, curr, mask))
        assert not kept[5] and not kept[11]
        assert kept.sum() == 38

    def test_keeps_original_when_too_few_survive(self):
        prev = _make_points(12, seed=6)
        r = np.random.default_rng(7)
        curr = prev + r.normal(0, 50.0, (12, 2)).astype(np.float32)
        mask = np.ones(12, bool)
        kept = np.asarray(motion.remove_outliers_median(
            prev, curr, mask, min_keep=10))
        # fewer than 10 inliers -> original mask returned
        assert kept.sum() == 12 or kept.sum() >= 10


def _reference_box(path, r):
    """The reference's count-normalized clamped box (Stabilizer.cpp:1156-1168)."""
    n = len(path)
    out = []
    for i in range(n):
        lo, hi = max(0, i - r), min(n - 1, i + r)
        out.append(sum(path[lo:hi + 1]) / (hi - lo + 1))
    return out


def _reference_gaussian(path, sigma):
    """gaussianFilterConvolve (Stabilizer.cpp:1364-1413)."""
    k = np.asarray(gaussian_kernel(sigma))
    c = len(k) // 2
    n = len(path)
    padded = np.concatenate([
        [path[c - i] for i in range(c)],
        path,
        [path[n - 1 - i] for i in range(c)]])
    return [float(np.dot(padded[i:i + len(k)], k)) for i in range(n)]


def _reference_kalman(path, q=0.01, r=0.1):
    """kalmanFilterSmooth (Stabilizer.cpp:1416-1458)."""
    x = np.array([path[0], 0.0])
    p = np.zeros((2, 2))
    f = np.array([[1.0, 1.0], [0.0, 1.0]])
    qm = np.eye(2) * q
    out = [path[0]]
    for z in path[1:]:
        x = f @ x
        p = f @ p @ f.T + qm
        s = p[0, 0] + r
        k = p[:, 0] / s
        x = x + k * (z - x[0])
        p = p - np.outer(k, p[0, :])
        out.append(x[0])
    return out


class TestFilterEmission:
    """The O(window) ring emission must reproduce the reference's full-path
    re-filtering at every emitted index, exactly."""

    def _fill_ring(self, path):
        ring = jnp.zeros((64, 3), jnp.float32)
        for i, v in enumerate(path):
            ring = ring_push(ring, jnp.int32(i), jnp.float32(v) * jnp.ones(3))
        return ring

    def test_box_emission_matches_full_refilter(self):
        rng = np.random.default_rng(8)
        path = list(np.cumsum(rng.normal(0, 1, 40)).astype(np.float32))
        r = 4
        for n in range(6, 41, 7):          # growing path lengths
            ring = self._fill_ring(path[:n])
            ref = _reference_box(path[:n], r)
            for e in range(max(0, n - 10), n):
                got = np.asarray(box_filter_emit(
                    ring, jnp.int32(n), jnp.int32(e), jnp.int32(r), r_max=8))
                assert np.allclose(got[0], ref[e], atol=1e-4), (n, e)

    def test_box_identity_when_short(self):
        path = [1.0, 2.0, 3.0]
        ring = self._fill_ring(path)
        got = np.asarray(box_filter_emit(ring, jnp.int32(3), jnp.int32(1),
                                         jnp.int32(5), r_max=8))
        assert np.allclose(got[0], 2.0)

    def test_gaussian_emission_matches_full_refilter(self):
        rng = np.random.default_rng(9)
        path = list(np.cumsum(rng.normal(0, 1, 30)).astype(np.float32))
        k = gaussian_kernel(2.0)
        for n in (15, 22, 30):
            ring = self._fill_ring(path[:n])
            ref = _reference_gaussian(path[:n], 2.0)
            for e in range(max(0, n - 8), n):
                got = np.asarray(gaussian_filter_emit(
                    ring, jnp.int32(n), jnp.int32(e), k))
                assert np.allclose(got[0], ref[e], atol=1e-4), (n, e)

    def test_adaptive_radius_homography_channel_mapping(self):
        """For the 9-channel log-homography ring, adaptive_radius must read
        translation from l02/l12 and rotation from the antisymmetric upper
        2x2 — mapping the same motion as an equivalent (dx, dy, da) ring
        onto the same radius (the raw first-three-channels read would
        weight x-translation by the 1000x rotation factor and pin the
        radius at max)."""
        from video_stab_tpu.motion.filters import adaptive_radius

        rng = np.random.default_rng(11)
        n = 20
        dx = rng.normal(0, 3, n).astype(np.float32)
        dy = rng.normal(0, 3, n).astype(np.float32)
        da = rng.normal(0, 0.01, n).astype(np.float32)

        ring3 = jnp.zeros((64, 3), jnp.float32)
        ring9 = jnp.zeros((64, 9), jnp.float32)
        for i in range(n):
            ring3 = ring_push(ring3, jnp.int32(i),
                              jnp.asarray([dx[i], dy[i], da[i]]))
            # Near-identity sl(3): log H ~ [[0, -da, dx], [da, 0, dy], 0].
            l = np.zeros(9, np.float32)
            l[1], l[3] = -da[i], da[i]
            l[2], l[5] = dx[i], dy[i]
            ring9 = ring_push(ring9, jnp.int32(i), jnp.asarray(l))

        r3 = int(adaptive_radius(ring3, jnp.int32(n), 10))
        r9 = int(adaptive_radius(ring9, jnp.int32(n), 10))
        assert r3 == r9
        assert r9 < 25          # not pinned at the band max

    def test_kalman_cursor_matches_full_forward_pass(self):
        rng = np.random.default_rng(10)
        path = list(np.cumsum(rng.normal(0, 1, 25)).astype(np.float32))
        ref = _reference_kalman(path)
        z0 = jnp.float32(path[0]) * jnp.ones(3)
        state = {"x": jnp.stack([z0, jnp.zeros(3)]),
                 "p": jnp.zeros((2, 2, 3))}
        got = [path[0]]
        for z in path[1:]:
            state, out = kalman_step(state, jnp.float32(z) * jnp.ones(3))
            got.append(float(out[0]))
        assert np.allclose(got, ref, atol=1e-4)


class TestHFChain:
    def test_dead_zone_freezes_small_motion(self):
        st = motion.hf_init()
        kw = dict(dead_zone_threshold=2.0, freeze_duration=5,
                  accumulator_decay=0.9, shake_px=1.5, rot_lp_alpha=0.2,
                  horizon_lock=False)
        st, t = motion.hf_apply(st, jnp.float32([0.5, 0.5, 0.0]), **kw)
        assert np.allclose(np.asarray(t), 0.0)       # frozen
        assert bool(st.in_dead_zone)
        # large motion exits the freeze
        st, t = motion.hf_apply(st, jnp.float32([10.0, 0.0, 0.0]), **kw)
        assert np.allclose(np.asarray(t), [10.0, 0.0, 0.0], atol=1e-5)
        assert not bool(st.in_dead_zone)

    def test_micro_shake_suppression(self):
        st = motion.hf_init()
        kw = dict(dead_zone_threshold=0.01, freeze_duration=5,
                  accumulator_decay=0.9, shake_px=1.5, rot_lp_alpha=0.2,
                  horizon_lock=False)
        # establish a median of ~(5, 0) so motion clears the dead zone
        for _ in range(6):
            st, _ = motion.hf_apply(st, jnp.float32([5.0, 0.0, 0.0]), **kw)
        st, t = motion.hf_apply(st, jnp.float32([5.8, 0.0, 0.0]), **kw)
        t = np.asarray(t)
        # deviation 0.8 < 1.5 px -> residual x0.01 around the median
        assert abs(t[0] - 5.008) < 1e-3, t


class TestIntent:
    def test_pan_detection(self):
        ring = jnp.zeros((64, 3), jnp.float32)
        for i in range(20):
            ring = ring_push(ring, jnp.int32(i), jnp.float32([8.0, 0.0, 0.0]))
        intent = motion.analyze_motion_intent(
            ring, jnp.int32(20), jnp.float32([8.0, 0.0, 0.0]), jnp.int32(19))
        assert int(intent) == int(motion.MotionIntent.DELIBERATE_PAN)

    def test_normal_before_warmup(self):
        ring = jnp.zeros((64, 3), jnp.float32)
        intent = motion.analyze_motion_intent(
            ring, jnp.int32(3), jnp.float32([8.0, 0.0, 0.0]), jnp.int32(2))
        assert int(intent) == int(motion.MotionIntent.NORMAL)


class TestHomographyGolden:
    """Goldens for the 8-DOF path (DESIGN.md §8b): cv2.findHomography
    parity, sl(3) log/exp roundtrip tolerance, and an offline clip with a
    known ground-truth warp. Companions to tests/test_offline.py::
    TestHomographyPath (ground-truth H recovery, cv2 warpPerspective
    parity, jitter-reduction smoke)."""

    @staticmethod
    def _project_np(h, pts):
        d = h[2, 0] * pts[:, 0] + h[2, 1] * pts[:, 1] + h[2, 2]
        return np.stack(
            [(h[0, 0] * pts[:, 0] + h[0, 1] * pts[:, 1] + h[0, 2]) / d,
             (h[1, 0] * pts[:, 0] + h[1, 1] * pts[:, 1] + h[1, 2]) / d], 1)

    def test_parity_vs_cv2_findhomography(self):
        """Same outlier-laced correspondences to both estimators: inlier
        sets must agree and both reprojection errors (on the clean points)
        must match ground truth to sub-0.1 px."""
        import cv2

        from video_stab_tpu.motion import estimate_homography_ransac

        h_true = np.float32([[1.03, 0.02, 4.0], [-0.01, 0.98, -2.5],
                             [2e-4, -1e-4, 1.0]])
        rng = np.random.default_rng(7)
        prev = (rng.random((100, 2)) * [640, 480]).astype(np.float32)
        curr = self._project_np(h_true, prev).astype(np.float32)
        bad = rng.choice(100, 25, replace=False)
        theta = rng.uniform(0, 2 * np.pi, 25)
        radius = rng.uniform(25, 80, 25)      # guaranteed outside 5 px
        curr[bad] += (radius[:, None] * np.stack(
            [np.cos(theta), np.sin(theta)], 1)).astype(np.float32)
        clean = np.setdiff1d(np.arange(100), bad)

        h_cv, inl_cv = cv2.findHomography(prev, curr, cv2.RANSAC, 5.0)
        h_us, ok, inl_us = estimate_homography_ransac(
            prev, curr, np.ones(100, bool), jax.random.PRNGKey(3),
            threshold=5.0, n_hypotheses=256)
        assert bool(ok)
        h_us = np.asarray(h_us)
        inl_us = np.asarray(inl_us)

        # Inlier sets: all clean points in, all outliers out, both sides.
        assert inl_us[clean].all() and not inl_us[bad].any()
        assert inl_cv.ravel().astype(bool)[clean].all()

        # Reprojection parity on the clean points (statistical parity:
        # RANSAC seeds differ; both must nail the ground truth).
        for h in (h_us / h_us[2, 2], h_cv / h_cv[2, 2]):
            err = np.linalg.norm(
                self._project_np(h, prev[clean]) - curr[clean], axis=1)
            assert err.max() < 0.1, err.max()

    def test_sl3_log_exp_roundtrip_tolerance(self):
        """exp(log(H)) == H/det^(1/3) across the magnitude range of real
        inter-frame homographies (the Mercator series' domain)."""
        from video_stab_tpu.motion import exp_homography, log_homography

        rng = np.random.default_rng(11)
        for scale in (1e-4, 1e-3, 1e-2, 5e-2):
            for _ in range(3):
                x = rng.normal(0, scale, (3, 3)).astype(np.float32)
                x[2, :2] *= 1e-2             # perspective terms are smaller
                h = (np.eye(3) + x).astype(np.float32)
                h[0, 2] += rng.normal(0, 100 * scale)   # translation px
                h[1, 2] += rng.normal(0, 100 * scale)
                back = np.asarray(exp_homography(log_homography(
                    jnp.asarray(h))))
                h_sl3 = h / np.cbrt(np.linalg.det(h))
                assert np.abs(back - h_sl3).max() < 5e-5, (scale, h)

    def test_offline_homography_clip_known_ground_truth(self):
        """Clip = world seen through smooth pan + known zero-mean projective
        jitter. The stabilized output must be much closer to the
        jitter-free ground-truth render than the input clip is."""
        import cv2

        from video_stab_tpu.core.params import StabilizerParams
        from video_stab_tpu.offline import stabilize_clip

        rng = np.random.default_rng(21)
        world = (cv2.GaussianBlur(
            rng.random((220, 280)).astype(np.float32), (0, 0), 2) * 255)
        n, w, h = 14, 96, 64
        frames, truth = [], []
        for i in range(n):
            pan = 40.0 + 0.5 * i            # smooth deliberate pan
            dx, dy = rng.normal(0, 2.0, 2)
            p1, p2 = rng.normal(0, 1.5e-4, 2)
            h_smooth = np.float32([[1, 0, -pan], [0, 1, -40], [0, 0, 1]])
            h_jit = np.float32([[1, 0, -(pan + dx)], [0, 1, -(40 + dy)],
                                [p1, p2, 1.0]])
            frames.append(cv2.warpPerspective(world, h_jit, (w, h)))
            truth.append(cv2.warpPerspective(world, h_smooth, (w, h)))
        clip = np.stack([np.repeat(f[:, :, None], 3, 2).astype(np.uint8)
                         for f in frames])
        truth = np.stack([np.repeat(f[:, :, None], 3, 2).astype(np.uint8)
                          for f in truth])

        p = StabilizerParams(smoothing_radius=6, motion_model="homography",
                             ransac_hypotheses=128, analysis_width=96,
                             analysis_height=64, max_corners=48)
        out = stabilize_clip(clip, p)

        def err_vs_truth(x):
            a = x[:, 12:-12, 12:-12].astype(np.float32)
            b = truth[:, 12:-12, 12:-12].astype(np.float32)
            return float(np.abs(a - b).mean())

        assert err_vs_truth(out) < err_vs_truth(clip) * 0.55, \
            (err_vs_truth(out), err_vs_truth(clip))
