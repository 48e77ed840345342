"""Op-level golden tests vs OpenCV (the reference's substrate).

Pin down sampling conventions, channel order, and border-mode edge cases
early (SURVEY.md §7 'hard parts'). Tolerances reflect float vs OpenCV's
fixed-point internals.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_bgr, make_textured

import video_stab_tpu.ops as ops


class TestColor:
    def test_bgr_to_gray_matches_cv2(self):
        img = make_bgr(32, 40, seed=3)
        ours = np.asarray(ops.bgr_to_gray(img))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        assert np.allclose(ours, ref, atol=0.01)

    def test_hsv_roundtrip(self):
        img = make_bgr(16, 20, seed=4)
        back = np.asarray(ops.hsv_to_bgr(ops.bgr_to_hsv(img)))
        assert np.allclose(back, img, atol=0.5)

    def test_bgr_to_hsv_matches_cv2(self):
        img = make_bgr(16, 20, seed=5)
        ours = np.asarray(ops.bgr_to_hsv(img))
        ref = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_BGR2HSV).astype(np.float32)
        # S and V channels match closely; H wraps at 180 (uint8 truncation in cv2)
        assert np.allclose(ours[..., 2], ref[..., 2], atol=1.0)
        assert np.allclose(ours[..., 1], ref[..., 1], atol=2.5)
        dh = np.abs(ours[..., 0] - ref[..., 0])
        dh = np.minimum(dh, 180.0 - dh)
        assert np.percentile(dh, 95) < 2.0

    def test_bgr_to_i420_matches_bt601_reference(self):
        """Pixel-exact vs an independent numpy BT.601 limited-range
        implementation (the colorspace swscale feeds libx264; see
        test_codec.py::test_encode_yuv_matches_bgr_path for the
        encoder-path equivalence)."""
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        h, w = 48, 64
        bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = np.asarray(ops.bgr_to_i420(jnp.asarray(bgr)))
        assert got.shape == (h * 3 // 2, w) and got.dtype == np.uint8

        f = bgr.astype(np.float32)
        y = (f @ np.array([25.064, 129.057, 65.738], np.float32)) / 256 + 16
        u = (f @ np.array([112.439, -74.494, -37.945], np.float32)) / 256 + 128
        v = (f @ np.array([-18.285, -94.154, 112.439], np.float32)) / 256 + 128
        u = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        v = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

        def sat(x):
            return np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)

        ref = np.concatenate([sat(y), sat(u).reshape(h // 4, w),
                              sat(v).reshape(h // 4, w)], axis=0)
        # f32 associativity can flip an exact .5 by one ulp; allow <=1.
        assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1

    def test_i420_roundtrip_smooth(self):
        """bgr->i420->bgr recovers smooth content to within chroma
        subsampling error (a few counts)."""
        import jax.numpy as jnp
        h, w = 64, 96
        yy, xx = np.mgrid[0:h, 0:w]
        bgr = np.stack([(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256],
                       axis=-1).astype(np.uint8)
        i420 = ops.bgr_to_i420(jnp.asarray(bgr))
        back = np.asarray(ops.i420_to_bgr(i420, h))
        err = np.abs(back - bgr.astype(np.float32))
        assert err.mean() < 1.5 and err.max() < 6.0, (err.mean(), err.max())

    def test_i420_rejects_odd_sizes(self):
        import jax.numpy as jnp
        with pytest.raises(ValueError):
            ops.bgr_to_i420(jnp.zeros((30, 40, 3), jnp.uint8))

    def test_lab_roundtrip(self):
        img = make_bgr(16, 20, seed=6)
        back = np.asarray(ops.lab_to_bgr(ops.bgr_to_lab(img)))
        assert np.allclose(back, img, atol=1.5)

    def test_saturate_u8(self):
        x = np.float32([-5.0, 0.4, 0.5, 254.6, 300.0])
        out = np.asarray(ops.saturate_u8(x))
        assert out.dtype == np.uint8
        assert out.tolist() == [0, 0, 0, 255, 255] or out.tolist() == [0, 0, 1, 255, 255]


class TestResize:
    @pytest.mark.parametrize("shape_out", [(24, 30), (48, 64), (17, 23)])
    def test_matches_cv2_inter_linear(self, shape_out):
        img = make_textured(32, 40, seed=8)
        oh, ow = shape_out
        ours = np.asarray(ops.resize_bilinear(img, oh, ow))
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        assert np.allclose(ours, ref, atol=0.5), np.abs(ours - ref).max()

    def test_channels(self):
        img = make_bgr(32, 40, seed=9)
        ours = np.asarray(ops.resize_bilinear(img, 16, 20))
        ref = cv2.resize(img, (20, 16), interpolation=cv2.INTER_LINEAR)
        assert np.allclose(ours, ref, atol=0.5)

    def test_pyr_down_matches_cv2(self):
        img = make_textured(32, 40, seed=10)
        ours = np.asarray(ops.pyr_down(img))
        ref = cv2.pyrDown(img)
        assert ours.shape == ref.shape
        # interior matches; cv2 uses reflect-101 borders too
        assert np.allclose(ours, ref, atol=0.5)


class TestWarp:
    @pytest.mark.parametrize("mode_name,cv_mode", [
        ("black", cv2.BORDER_CONSTANT),
        ("replicate", cv2.BORDER_REPLICATE),
        ("reflect", cv2.BORDER_REFLECT),
        ("reflect_101", cv2.BORDER_REFLECT_101),
        ("wrap", cv2.BORDER_WRAP),
    ])
    def test_warp_affine_matches_cv2(self, mode_name, cv_mode):
        img = make_textured(32, 40, seed=11)
        a = np.deg2rad(7.0)
        m = np.float32([[np.cos(a), -np.sin(a), 3.5],
                        [np.sin(a), np.cos(a), -2.25]])
        code = ops.border_mode_from_name(mode_name)
        ours = np.asarray(ops.warp_affine(img, m, border_mode=code))
        ref = cv2.warpAffine(img, m, (40, 32), flags=cv2.INTER_LINEAR,
                             borderMode=cv_mode)
        # Ignore one-pixel rim: cv2 blends the constant at the exact border.
        diff = np.abs(ours - ref)[2:-2, 2:-2]
        assert np.percentile(diff, 99) < 1.0, diff.max()

    def test_invert_affine(self):
        m = np.float32([[0.98, -0.05, 3.0], [0.05, 0.98, -2.0]])
        minv = np.asarray(ops.invert_affine(m))
        ref = cv2.invertAffineTransform(m)
        assert np.allclose(minv, ref, atol=1e-5)

    def test_rotation_matrix_2d(self):
        ours = np.asarray(ops.rotation_matrix_2d(20.0, 15.0, 12.5))
        ref = cv2.getRotationMatrix2D((20.0, 15.0), 12.5, 1.0)
        assert np.allclose(ours, ref, atol=1e-5)


class TestFilters:
    def test_gaussian_blur_matches_cv2(self):
        img = make_textured(32, 40, seed=12)
        ours = np.asarray(ops.gaussian_blur(img, 1.5))
        ref = cv2.GaussianBlur(img, (0, 0), 1.5, borderType=cv2.BORDER_REFLECT_101)
        assert np.allclose(ours, ref, atol=0.1)

    def test_box_blur_matches_cv2(self):
        img = make_textured(32, 40, seed=13)
        ours = np.asarray(ops.box_blur(img, 5))
        ref = cv2.blur(img, (5, 5), borderType=cv2.BORDER_REFLECT_101)
        assert np.allclose(ours, ref, atol=0.1)

    def test_sobel_matches_cv2(self):
        img = make_textured(32, 40, seed=14)
        gx, gy = ops.sobel(img)
        ref_x = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3,
                          borderType=cv2.BORDER_REFLECT_101)
        ref_y = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3,
                          borderType=cv2.BORDER_REFLECT_101)
        assert np.allclose(np.asarray(gx), ref_x, atol=0.01)
        assert np.allclose(np.asarray(gy), ref_y, atol=0.01)

    def test_threshold_binary(self):
        img = make_textured(16, 20, seed=15)
        ours = np.asarray(ops.threshold_binary(img, 100.0, 255.0))
        _, ref = cv2.threshold(img, 100.0, 255.0, cv2.THRESH_BINARY)
        assert np.array_equal(ours, ref)

    def test_morphology_matches_cv2(self):
        img = (make_textured(24, 28, seed=16) > 128).astype(np.float32) * 255.0
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        ours_d = np.asarray(ops.dilate(img, 5))
        ref_d = cv2.dilate(img, k)
        assert np.array_equal(ours_d, ref_d)
        ours_e = np.asarray(ops.erode(img, 5))
        ref_e = cv2.erode(img, k)
        # erode border handling differs at the rim (cv2 pads with +inf)
        assert np.array_equal(ours_e[2:-2, 2:-2], ref_e[2:-2, 2:-2])

    def test_clahe_close_to_cv2(self):
        img = make_textured(64, 64, seed=17)
        ours = np.asarray(ops.clahe(img, 2.0, 8))
        ref = cv2.createCLAHE(2.0, (8, 8)).apply(img.astype(np.uint8)).astype(np.float32)
        # same integer clip/redistribute/LUT path; 0.5 = uint8 rounding
        assert np.abs(ours - ref).max() <= 0.5 + 1e-5


class TestFeatures:
    def test_gftt_finds_cv2_corners(self):
        img = np.zeros((60, 80), np.float32)
        for (y, x) in [(12, 14), (12, 60), (44, 20), (44, 66), (30, 40)]:
            img[y:y + 8, x:x + 8] = 255.0
        img = cv2.GaussianBlur(img, (0, 0), 1.0)
        # min_distance 4 keeps every square corner: with a larger radius the
        # 4 corners of one square fall inside one exclusion zone and cv2's
        # tie-break picks a different (equal-quality) survivor than ours.
        pts, mask = ops.good_features_to_track(
            img, max_corners=32, quality_level=0.01, min_distance=4.0)
        pts = np.asarray(pts)[np.asarray(mask)]
        ref = cv2.goodFeaturesToTrack(img.astype(np.uint8), 32, 0.01, 4.0,
                                      blockSize=3)
        ref = ref.reshape(-1, 2)
        # every cv2 corner should have one of ours within 2 px
        for rp in ref:
            d = np.sqrt(((pts - rp) ** 2).sum(axis=1)).min()
            assert d < 2.0, (rp, d)


class TestLK:
    def test_tracks_pure_translation(self):
        world = make_textured(100, 140, seed=18, sigma=1.5)
        prev = world[10:74, 10:106]
        curr = world[13:77, 12:108]   # shift by (+2, +3) in (x, y)
        pts = np.float32([[20, 20], [48, 30], [70, 40], [30, 50]])
        mask = np.ones(4, bool)
        out, status, err = ops.lk_track(prev, curr, pts, mask,
                                        win=15, max_level=2, iters=20)
        out = np.asarray(out)
        assert np.asarray(status).all()
        flow = out - pts
        assert np.allclose(flow[:, 0], -2.0, atol=0.3), flow
        assert np.allclose(flow[:, 1], -3.0, atol=0.3), flow

    def test_tracks_moderate_translation(self):
        """Top-pyramid-level drift budget (ops/lk.py DRIFT_TOP): a ~22 px
        pan starts 5.5 px off at 1/4 res — beyond the inner-level budget of
        8 combined with window falloff — and must converge coarse-to-fine."""
        world = make_textured(300, 400, seed=21, sigma=6.0)
        prev = world[50:178, 50:242]
        curr = world[54:182, 72:264]   # shift (+22, +4) in (x, y)
        # interior points: at 1/4 res a 15x15 window must fit inside
        pts = np.float32([[60, 40], [120, 70], [100, 60]])
        out, status, err = ops.lk_track(prev, curr, pts,
                                        np.ones(3, bool),
                                        win=15, max_level=2, iters=20)
        out = np.asarray(out)
        assert np.asarray(status).all(), np.asarray(err)
        flow = out - pts
        assert np.allclose(flow[:, 0], -22.0, atol=0.5), flow
        assert np.allclose(flow[:, 1], -4.0, atol=0.5), flow

    def test_matches_cv2_beyond_convergence_basin(self):
        """A 40 px pan is beyond LK's basin at this budget for BOTH
        implementations — parity means failing the same way cv2 fails,
        not silently diverging differently."""
        world = make_textured(300, 400, seed=21, sigma=1.5)
        prev = world[50:178, 50:242]
        curr = world[58:186, 90:282]
        pts = np.float32([[60, 40], [120, 70], [90, 100]])
        ours, st, _ = ops.lk_track(prev, curr, pts, np.ones(3, bool),
                                   win=15, max_level=2, iters=20)
        ref, _, _ = cv2.calcOpticalFlowPyrLK(
            prev.astype(np.uint8), curr.astype(np.uint8),
            pts.reshape(-1, 1, 2), None, winSize=(15, 15), maxLevel=2,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                      20, 0.03))
        d = np.abs(np.asarray(ours) - ref.reshape(-1, 2))
        assert d.max() < 1.0, d

    def test_matches_cv2_lk(self):
        world = make_textured(120, 160, seed=19, sigma=1.5)
        prev = world[10:90, 10:130]
        curr = world[12:92, 13:133]
        pts = np.float32([[30, 25], [60, 40], [90, 55], [45, 65]])
        ours, status, _ = ops.lk_track(prev, curr, pts, np.ones(4, bool),
                                       win=15, max_level=2, iters=20)
        ref, st, _ = cv2.calcOpticalFlowPyrLK(
            prev.astype(np.uint8), curr.astype(np.uint8), pts, None,
            winSize=(15, 15), maxLevel=2,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 20, 0.03))
        ours = np.asarray(ours)
        ok = st.reshape(-1).astype(bool) & np.asarray(status)
        assert ok.sum() >= 3
        assert np.allclose(ours[ok], ref[ok], atol=0.5), (ours, ref)


class TestCannyHough:
    def test_detects_line_angle(self):
        img = np.zeros((64, 96), np.float32)
        cv2.line(img, (5, 40), (90, 28), 255.0, 2)
        img = cv2.GaussianBlur(img, (0, 0), 0.8)
        edges = ops.canny_edges(img, 50.0, 150.0)
        assert np.asarray(edges).sum() > 0
        lines, votes, mask = ops.hough_lines(np.asarray(edges),
                                             threshold=30, max_lines=8)
        lines = np.asarray(lines)
        assert np.asarray(mask).any()
        theta = lines[0, 1]
        angle_deg = np.degrees(theta) - 90.0
        expected = np.degrees(np.arctan2(28 - 40, 90 - 5))
        assert abs(angle_deg - expected) < 3.0, (angle_deg, expected)


class TestFast:
    def test_matches_cv2_fast(self):
        img = np.zeros((60, 80), np.float32)
        for (y, x) in [(12, 14), (12, 60), (44, 20), (44, 66), (30, 40)]:
            img[y:y + 8, x:x + 8] = 255.0
        img = cv2.GaussianBlur(img, (0, 0), 0.8)
        pts, mask = ops.fast_corners(img, threshold=20.0, max_corners=64,
                                     min_distance=4.0)
        pts = np.asarray(pts)[np.asarray(mask)]
        kps = cv2.FastFeatureDetector_create(20).detect(img.astype(np.uint8))
        ref = np.array([k.pt for k in kps])
        assert len(ref) > 0
        for rp in ref:
            d = np.sqrt(((pts - rp) ** 2).sum(axis=1)).min()
            assert d < 3.0, (rp, d)

    def test_orb_brisk_variants_find_corners(self):
        img = np.zeros((60, 80), np.float32)
        img[20:40, 30:50] = 255.0
        img = cv2.GaussianBlur(img, (0, 0), 0.8)
        for fn in (ops.orb_corners, ops.brisk_corners):
            pts, mask = fn(img, 20.0, max_corners=16)
            assert np.asarray(mask).sum() >= 4   # the 4 square corners

    def test_nms_topk_matches_sequential_greedy(self):
        """The parallel-frontier greedy (_nms_compact reuse) must be EXACT
        vs candidate-by-candidate sequential greedy NMS — the semantics the
        fori_loop it replaced implemented."""
        from video_stab_tpu.ops.fast import _nms_topk

        rng = np.random.default_rng(3)
        resp = rng.random((48, 64)).astype(np.float32)
        resp[resp < 0.7] = 0.0        # sparse peaks
        k, min_d = 32, 5.0
        pts, mask = _nms_topk(jnp.asarray(resp), k, min_d)
        pts, mask = np.asarray(pts), np.asarray(mask)

        # Oracle: 3x3 NMS peaks, quality-ordered sequential greedy.
        h, w = resp.shape
        pad = np.pad(resp, 1, constant_values=-1.0)
        neigh = np.max(
            [pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0)], axis=0)
        cand = np.where((resp >= neigh) & (resp > 0), resp, -1.0).ravel()
        order = np.argsort(-cand, kind="stable")
        sel = []
        for i in order:
            if cand[i] <= 0 or len(sel) == k:
                break
            y, x = divmod(int(i), w)
            if all((x - sx) ** 2 + (y - sy) ** 2 >= min_d * min_d
                   for sx, sy in sel):
                sel.append((float(x), float(y)))
        got = [tuple(p) for p in pts[mask]]
        assert got == sel


class TestGfttTwoStageTopK:
    """The per-row/global two-stage candidate extraction (ops/features.py)
    must be EXACT vs a flat top_k — including when the per-row budget
    overflows and the in-graph guard falls back."""

    def _both(self, img, **kw):
        import video_stab_tpu.ops.features as F
        pts_a, mask_a = F.good_features_to_track(img, **kw)
        # force the flat path by shrinking the candidate pool cap so the
        # static condition h*ROW_BUDGET < n_cand is False... instead call
        # the flat top_k directly by monkeypatching ROW_BUDGET via a huge
        # n_candidates (h*32 < n_candidates -> flat branch).
        pts_b, mask_b = F.good_features_to_track(
            img, n_candidates=img.shape[0] * 33, **kw)
        return (np.asarray(pts_a), np.asarray(mask_a),
                np.asarray(pts_b), np.asarray(mask_b))

    def test_production_size_matches_flat(self):
        img = make_textured(540, 960, seed=23, sigma=1.2) * 255.0 / 255.0
        img = make_textured(540, 960, seed=23, sigma=1.2)
        pa, ma, pb, mb = self._both(img, max_corners=200,
                                    quality_level=0.01, min_distance=30.0)
        assert (ma == mb).all()
        assert np.array_equal(pa[ma], pb[mb])

    def test_redetect_params_match_flat(self):
        # The fast re-detect config (Stabilizer.cpp:696-747: quality 0.02,
        # minDistance 15) — denser candidates, lighter suppression; the
        # staged budget usually fills max_corners from the top 512.
        img = make_textured(540, 960, seed=31, sigma=1.0)
        pa, ma, pb, mb = self._both(img, max_corners=200,
                                    quality_level=0.02, min_distance=15.0)
        assert (ma == mb).all()
        assert np.array_equal(pa[ma], pb[mb])

    def test_vs_cv2_at_production_size(self):
        img = make_textured(540, 960, seed=29, sigma=1.5)
        import video_stab_tpu.ops.features as F
        pts, mask = F.good_features_to_track(
            img, max_corners=100, quality_level=0.02, min_distance=30.0)
        pts = np.asarray(pts)[np.asarray(mask)]
        ref = cv2.goodFeaturesToTrack(img.astype(np.uint8), 100, 0.02,
                                      30.0, blockSize=3)
        ref = ref.reshape(-1, 2)
        hits = sum(np.sqrt(((pts - rp) ** 2).sum(1)).min() < 2.0
                   for rp in ref)
        assert hits >= len(ref) * 0.9, (hits, len(ref))

    def test_guard_fallback_on_dense_row(self):
        """One row stuffed with >32 strong peaks: the guard must trigger
        and the result still equal the flat path exactly."""
        img = np.zeros((128, 960), np.float32)
        for x in range(4, 956, 6):          # ~158 peaks in row band 60
            img[60:63, x:x + 2] = 255.0
        rng = np.random.default_rng(0)
        img += rng.random((128, 960)).astype(np.float32)
        pa, ma, pb, mb = self._both(img, max_corners=64,
                                    quality_level=0.01, min_distance=3.0)
        assert (ma == mb).all()
        assert np.array_equal(pa[ma], pb[mb])

    def test_staged_budget_insufficient_fallback(self):
        """>N_FAST real candidates whose strongest 512 cluster so densely
        that NMS can't fill max_corners from them: the staged-budget
        'insufficient' guard must fall back to the full budget and match
        the flat path exactly (ops/features.py staged-budget block)."""
        rng = np.random.default_rng(7)
        img = rng.random((540, 960)).astype(np.float32)
        # ~900 strong peaks packed into a 300x300 corner (spacing 10 <<
        # min_distance -> heavy suppression among the top-ranked), plus
        # widely-spaced weak peaks only reachable past rank 512.
        for y in range(10, 300, 10):
            for x in range(10, 300, 10):
                img[y, x] = 200.0 + rng.random() * 50.0
        for y in range(20, 520, 55):
            for x in range(340, 940, 55):
                img[y, x] = 50.0 + rng.random() * 20.0
        pa, ma, pb, mb = self._both(img, max_corners=150,
                                    quality_level=0.001, min_distance=60.0)
        assert (ma == mb).all()
        assert np.array_equal(pa[ma], pb[mb])


class TestGfttStagedVmapClean:
    """topk="staged": the cond-free single-branch variant for vmapped
    serving (VERDICT r3 #3). Must (a) contain NO lax.cond in its jaxpr so
    vmap never runs both branches, and (b) match the exact path on
    typical content."""

    def test_no_cond_in_jaxpr(self):
        import jax

        import video_stab_tpu.ops.features as F
        fn = lambda g: F.good_features_to_track(   # noqa: E731
            g, max_corners=200, quality_level=0.02, min_distance=15.0,
            topk="staged")
        jaxpr = str(jax.make_jaxpr(fn)(np.zeros((540, 960), np.float32)))
        assert "cond[" not in jaxpr and " cond " not in jaxpr
        # ... while the exact "auto" variant does guard with cond.
        fn_auto = lambda g: F.good_features_to_track(   # noqa: E731
            g, max_corners=200, quality_level=0.02, min_distance=15.0)
        assert "cond" in str(
            jax.make_jaxpr(fn_auto)(np.zeros((540, 960), np.float32)))

    def test_matches_exact_on_textured_frames(self):
        import video_stab_tpu.ops.features as F
        for seed in (23, 31, 47):
            img = make_textured(540, 960, seed=seed, sigma=1.2)
            kw = dict(max_corners=200, quality_level=0.02,
                      min_distance=15.0)
            pa, ma = F.good_features_to_track(img, topk="staged", **kw)
            pb, mb = F.good_features_to_track(img, **kw)
            pa, ma = np.asarray(pa), np.asarray(ma)
            pb, mb = np.asarray(pb), np.asarray(mb)
            assert (ma == mb).all()
            assert np.array_equal(pa[ma], pb[mb])

    def test_vmapped_batch_matches_per_stream(self):
        import jax

        import video_stab_tpu.ops.features as F
        imgs = np.stack([make_textured(270, 480, seed=s, sigma=1.2)
                         for s in (3, 5, 11, 13)])
        fn = lambda g: F.good_features_to_track(   # noqa: E731
            g, max_corners=100, quality_level=0.02, min_distance=15.0,
            topk="staged")
        pv, mv = jax.vmap(fn)(imgs)
        for i in range(imgs.shape[0]):
            p1, m1 = fn(imgs[i])
            assert np.array_equal(np.asarray(mv[i]), np.asarray(m1))
            assert np.array_equal(np.asarray(pv[i]), np.asarray(p1))


class TestGlobalTranslationPrior:
    """ops/lk.global_translation_prior: exact integer content motion on
    textured frames; zero (confidence-gated) on flat/ambiguous content."""

    def test_recovers_known_shift(self):
        from video_stab_tpu.ops.lk import global_translation_prior
        world = make_textured(300, 400, seed=5, sigma=2)
        for (wx, wy) in [(5, 3), (-8, 2), (0, 0), (12, -9)]:
            a = world[50:185, 60:300]
            b = world[50 + wy:185 + wy, 60 + wx:300 + wx]
            g = np.asarray(global_translation_prior(a, b))
            # window moved +w => content moved -w
            assert (g == np.float32([-wx, -wy])).all(), ((wx, wy), g)

    def test_confidence_gate_on_flat_content(self):
        from video_stab_tpu.ops.lk import global_translation_prior
        flat = np.full((135, 240), 100.0, np.float32)
        g = np.asarray(global_translation_prior(flat, flat))
        assert (g == 0.0).all()

    def test_lk_with_prior_tracks_large_pan(self):
        """A pan beyond the no-prior convergence range: the prior recovers
        it (the motion_prediction robustness story)."""
        import video_stab_tpu.ops as ops
        from video_stab_tpu.ops.lk import global_translation_prior

        world = make_textured(400, 520, seed=18, sigma=1.5)
        prev = world[100:235, 100:340]
        shift = 20
        curr = world[100:235, 100 + shift:340 + shift]   # content -20 in x
        pts = np.float32([[60, 40], [120, 70], [180, 100], [90, 110]])
        mask = np.ones(4, bool)
        g = np.asarray(global_translation_prior(prev, curr))
        assert g[0] == -shift and g[1] == 0.0, g
        init = pts + g[None, :]
        out, status, _ = ops.lk_track(prev, curr, pts, mask,
                                      win=15, max_level=2, iters=20,
                                      init_pts=init)
        out = np.asarray(out)
        assert np.asarray(status).all()
        assert np.allclose(out[:, 0] - pts[:, 0], -shift, atol=0.3)
        assert np.allclose(out[:, 1] - pts[:, 1], 0.0, atol=0.3)


class TestHoughThetaWindow:
    """theta_range exactness: windowed sweep == full sweep restricted to
    the window (votes, peaks, and line parameters)."""

    def test_windowed_equals_full_in_window(self):
        import math

        from video_stab_tpu.ops.hough import hough_lines
        rng = np.random.default_rng(3)
        edges = (rng.random((120, 160)) > 0.92).astype(np.float32)
        # add two near-horizontal lines so real peaks exist in the window
        edges[40, :] = 1.0
        for x in range(160):
            y = int(70 + 0.06 * x)
            edges[y, x] = 1.0
        lo, hi = math.radians(80.0), math.radians(100.0)
        lw, vw, mw = hough_lines(edges, threshold=40, max_lines=64,
                                 theta_range=(lo, hi))
        lf, vf, mf = hough_lines(edges, threshold=40, max_lines=256)
        lw, vw, mw = map(np.asarray, (lw, vw, mw))
        lf, vf, mf = map(np.asarray, (lf, vf, mf))
        keep = mf & (lf[:, 1] >= lo) & (lf[:, 1] <= hi)
        full = {(round(r, 3), round(t, 5), v)
                for (r, t), v in zip(lf[keep], vf[keep])}
        win_keep = mw & (lw[:, 1] >= lo) & (lw[:, 1] <= hi)
        win = {(round(r, 3), round(t, 5), v)
               for (r, t), v in zip(lw[win_keep], vw[win_keep])}
        assert win == full, (win ^ full)


class TestHoughSparseDense:
    """impl="auto" edge-compaction exactness: identical accumulator output
    to the dense per-theta sweep, both when the compaction capacity admits
    every edge pixel and when the in-graph guard falls back to dense."""

    def _edges(self, seed=7):
        rng = np.random.default_rng(seed)
        edges = (rng.random((96, 144)) > 0.93).astype(np.float32)
        edges[30, :] = 1.0
        for x in range(144):
            edges[int(60 + 0.05 * x), x] = 1.0
        return edges

    def test_sparse_equals_dense(self):
        import math

        from video_stab_tpu.ops.hough import hough_lines
        edges = self._edges()
        tr = (math.radians(80.0), math.radians(100.0))
        kw = dict(threshold=30, max_lines=64, theta_range=tr)
        ls, vs, ms = hough_lines(edges, impl="auto", max_edges=4096, **kw)
        ld, vd, md = hough_lines(edges, impl="dense", **kw)
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(ld))
        np.testing.assert_array_equal(np.asarray(vs), np.asarray(vd))
        np.testing.assert_array_equal(np.asarray(ms), np.asarray(md))

    def test_overflow_falls_back_exact(self):
        import math

        from video_stab_tpu.ops.hough import hough_lines
        edges = self._edges(seed=11)
        assert edges.sum() > 64  # capacity 64 must overflow -> dense branch
        tr = (math.radians(80.0), math.radians(100.0))
        kw = dict(threshold=30, max_lines=64, theta_range=tr)
        lo, vo, mo = hough_lines(edges, impl="auto", max_edges=64, **kw)
        ld, vd, md = hough_lines(edges, impl="dense", **kw)
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(ld))
        np.testing.assert_array_equal(np.asarray(vo), np.asarray(vd))
        np.testing.assert_array_equal(np.asarray(mo), np.asarray(md))


class TestResampleAxisAligned:
    """resample_axis_aligned == warp_affine restricted to diagonal maps
    (AutoZoomCrop's dynamic crop+resize moved off the 2-D gather)."""

    def test_matches_warp_affine(self):
        import jax.numpy as jnp

        from video_stab_tpu.ops.resize import resample_axis_aligned
        from video_stab_tpu.ops.warp import BORDER_CONSTANT, warp_affine
        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.random((37, 53, 3)).astype(np.float32) * 255)
        for (y0, sy, x0, sx, oh, ow) in (
                (3.25, 0.8, 5.75, 0.9, 40, 48),
                (0.0, 37 / 24, 0.0, 53 / 40, 24, 40),
                (-0.5, 1.1, 51.0, 0.3, 32, 16)):   # partly out of range
            ref = warp_affine(
                img,
                jnp.asarray([[sx, 0.0, x0], [0.0, sy, y0]], jnp.float32),
                out_h=oh, out_w=ow, border_mode=BORDER_CONSTANT,
                inverse_map=True)
            got = resample_axis_aligned(img, jnp.float32(y0),
                                        jnp.float32(sy), jnp.float32(x0),
                                        jnp.float32(sx), oh, ow)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-3)
