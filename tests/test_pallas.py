"""Pallas kernel tests (interpreter mode on CPU; the same code paths compile
on TPU — validated by bench/graft runs on hardware)."""

import numpy as np
import jax.numpy as jnp

from video_stab_tpu import pallas as vp
from video_stab_tpu.pallas.traj import box_filter_convolve_reference


class TestTrajKernel:
    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(0)
        path = jnp.asarray(rng.normal(0, 5, (300,)).astype(np.float32))
        for r in (1, 5, 16, 50):
            a = np.asarray(vp.box_filter_convolve(path, r))
            b = np.asarray(box_filter_convolve_reference(path, r))
            assert np.allclose(a, b, atol=1e-4), r

    def test_multichannel(self):
        rng = np.random.default_rng(1)
        p3 = jnp.asarray(rng.normal(0, 5, (211, 3)).astype(np.float32))
        a = np.asarray(vp.box_filter_convolve(p3, 8))
        b = np.asarray(box_filter_convolve_reference(p3, 8))
        assert np.allclose(a, b, atol=1e-4)

    def test_oracle_matches_cuda_kernel_layout(self):
        # Hand-check the window convention on a tiny case vs the reference
        # kernel math (stabilizer_cuda.cu:7-16): out[i] = mean of
        # padded[i..i+r-1] with r median samples prepended.
        path = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        r = 2
        med = 3.0  # upper median of [1,2,3,4]
        padded = [med, med, 1.0, 2.0, 3.0, 4.0]
        expect = [(padded[i] + padded[i + 1]) / 2 for i in range(4)]
        got = np.asarray(box_filter_convolve_reference(path, r))
        assert np.allclose(got, expect)


class TestCornerKernel:
    def test_matches_unfused_ops(self):
        from video_stab_tpu.ops.features import _dilate3x3, min_eig_response

        rng = np.random.default_rng(2)
        gray = jnp.asarray((rng.random((64, 128)) * 255).astype(np.float32))
        resp, peak = vp.corner_response(gray)
        ref_resp = min_eig_response(gray, 3)
        ref_peak = ref_resp >= _dilate3x3(ref_resp)
        # Interior agrees to f32 rounding. The 2-px rim differs by border
        # convention: the fused kernel reflect-pads the SOURCE once while the
        # unfused chain (like cv2) re-pads each stage's output — border
        # responses are discarded by feature margins either way.
        assert np.allclose(np.asarray(resp)[2:-2, 2:-2],
                           np.asarray(ref_resp)[2:-2, 2:-2], atol=1e-5)
        # Peak mask: float-rounding between the two pipelines can flip exact
        # ties (resp == neighbour); require >=99.5% interior agreement.
        agree = np.mean(np.asarray(peak)[2:-2, 2:-2] ==
                        np.asarray(ref_peak)[2:-2, 2:-2])
        assert agree >= 0.995, agree


class TestEnhanceKernel:
    def test_matches_enhancer_chain(self):
        from video_stab_tpu.core.enhancer import gamma_correct, white_balance

        rng = np.random.default_rng(3)
        img = jnp.asarray((rng.random((100, 140, 3)) * 255).astype(np.float32))
        out = vp.enhance_pointwise(img, contrast=1.2, brightness=10.0,
                                   gamma=0.8, enable_white_balance=True,
                                   wb_strength=0.5)
        ref = gamma_correct(
            jnp.clip(white_balance(img, 0.5) * 1.2 + 10.0, 0, 255), 0.8)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

    def test_non_tile_height(self):
        img = jnp.ones((37, 128, 3), jnp.float32) * 100.0
        out = vp.enhance_pointwise(img, contrast=2.0)
        assert out.shape == (37, 128, 3)
        assert np.allclose(np.asarray(out), 200.0)


class TestWarpKernel:
    """pallas/warp.py — the emit hot path's full-frame affine warp
    (interpret mode on CPU; bit-exact vs the XLA gather formulation on TPU,
    measured 5.6 ms vs 18.7 ms at 1080p x3)."""

    def _check(self, h, w, ang, tx, ty, seed=0):
        from video_stab_tpu.ops.warp import warp_affine
        from video_stab_tpu.pallas.warp import warp_affine_u8
        rng = np.random.default_rng(seed)
        img = jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        m = jnp.array([[np.cos(ang), -np.sin(ang), tx],
                       [np.sin(ang), np.cos(ang), ty]], jnp.float32)
        ref = warp_affine(img.astype(jnp.float32), m)
        ref_u8 = jnp.clip(jnp.round(ref), 0, 255).astype(jnp.uint8)
        out = warp_affine_u8(img, m, interpret=True)
        d = np.abs(np.asarray(out).astype(int)
                   - np.asarray(ref_u8).astype(int))
        assert d.max() == 0, (d.max(), (d > 0).mean())

    def test_exact_vs_gather_reference(self):
        self._check(24, 40, 0.04, 3.3, -2.2)

    def test_non_tile_multiple_shape(self):
        self._check(27, 133, -0.03, -5.0, 4.5, seed=2)

    def test_identity_roundtrip(self):
        from video_stab_tpu.pallas.warp import warp_affine_u8
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.integers(0, 255, (16, 130, 3), dtype=np.uint8))
        m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        out = warp_affine_u8(img, m, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_wide_envelope_large_rotation_edge_rows(self):
        """A 10-deg rotation inside a 13-deg envelope (the fused-roll
        chain's regime): the pad must include the sin*width deviation or
        top/bottom edge tiles read clamped pad and come out black (the
        pad_y bug the round-3 review caught). Checks BOTH dispatch paths
        against the gather reference, including the frame edges."""
        from video_stab_tpu.ops.warp import warp_affine, warp_affine_tiled
        from video_stab_tpu.pallas.warp import warp_affine_u8
        rng = np.random.default_rng(5)
        h, w = 96, 640                      # wide: sin(10deg)*640 ~ 111 px
        img = jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        ang = np.radians(10.0)
        # rotation about the center (the fused emit composes this form)
        cx, cy = w / 2.0, h / 2.0
        m = jnp.array(
            [[np.cos(ang), -np.sin(ang),
              (1 - np.cos(ang)) * cx + np.sin(ang) * cy],
             [np.sin(ang), np.cos(ang),
              -np.sin(ang) * cx + (1 - np.cos(ang)) * cy]], jnp.float32)
        ref = np.asarray(warp_affine(img.astype(jnp.float32), m))
        ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.int64)
        # ~30-tap accumulation order differs from the 4-tap direct path;
        # measured f32 drift reaches ~0.01 at this angle, so rounding can
        # flip anywhere within that window of a .5 boundary.
        near_tie = np.abs(ref - np.floor(ref) - 0.5) < 2e-2
        for out in (
            np.asarray(warp_affine_u8(img, m, max_angle_deg=13.0,
                                      interpret=True)).astype(np.int64),
            np.round(np.asarray(warp_affine_tiled(
                img.astype(jnp.float32), m,
                max_angle_deg=13.0))).astype(np.int64),
        ):
            d = np.abs(out - ref_u8)
            assert d[~near_tie].max() == 0, d[~near_tie].max()
            assert d.max() <= 1
            # The bug signature was whole blacked-out edge tiles: output
            # must not be zero anywhere the reference is bright.
            assert not np.any((out == 0) & (ref_u8 > 64))


    def test_wide_tile_geometry_above_threshold(self):
        """Envelopes past the narrow-tile threshold (sin 13 deg) keep the
        (64, 128) tile geometry (the (64, 256) tile scoped-VMEM-OOMs on
        real Mosaic at 15 deg); both tile shapes must produce the same
        pixels as the gather reference. Pins the round-4 envelope-keyed
        _pick_tile split on its WIDE side (the narrow side is covered by
        every default-envelope test and the 13-deg edge-rows test)."""
        from video_stab_tpu.ops.warp import warp_affine
        from video_stab_tpu.pallas.warp import _pick_tile, warp_affine_u8
        assert _pick_tile(np.sin(np.radians(15.0))) == (64, 128)
        assert _pick_tile(np.sin(np.radians(13.0))) == (64, 256)
        rng = np.random.default_rng(7)
        h, w = 80, 300
        img = jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        ang = np.radians(11.0)
        cx, cy = w / 2.0, h / 2.0
        m = jnp.array(
            [[np.cos(ang), -np.sin(ang),
              (1 - np.cos(ang)) * cx + np.sin(ang) * cy],
             [np.sin(ang), np.cos(ang),
              -np.sin(ang) * cx + (1 - np.cos(ang)) * cy]], jnp.float32)
        ref = np.asarray(warp_affine(img.astype(jnp.float32), m))
        ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.int64)
        near_tie = np.abs(ref - np.floor(ref) - 0.5) < 2e-2
        out = np.asarray(warp_affine_u8(
            img, m, max_angle_deg=15.0, interpret=True)).astype(np.int64)
        d = np.abs(out - ref_u8)
        assert d[~near_tie].max() == 0, d[~near_tie].max()
        assert d.max() <= 1


class TestWarpKernelBranches:
    """The runtime small-rotation branch (3x fewer taps) and the
    half-to-even tie rounding contract."""

    def test_small_and_large_branch_both_exact(self):
        from video_stab_tpu.ops.warp import warp_affine
        from video_stab_tpu.pallas.warp import warp_affine_u8
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.integers(0, 255, (40, 140, 3), dtype=np.uint8))
        for ang_deg in (0.3, 1.2, 2.8, 5.5):    # small..large branch @6 deg
            ang = np.radians(ang_deg)
            m = jnp.array([[np.cos(ang), -np.sin(ang), 1.7],
                           [np.sin(ang), np.cos(ang), -2.4]], jnp.float32)
            ref = np.asarray(warp_affine(img.astype(jnp.float32), m))
            ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.int64)
            out = np.asarray(warp_affine_u8(img, m,
                                            interpret=True)).astype(np.int64)
            d = np.abs(out - ref_u8)
            # Exact except where the f32 bilinear value sits within float
            # accumulation tolerance of a .5 rounding boundary (two equal
            # formulations may land on either side there).
            near_tie = np.abs(ref - np.floor(ref) - 0.5) < 1e-3
            assert d[~near_tie].max() == 0, (ang_deg, d[~near_tie].max())
            assert d.max() <= 1, (ang_deg, d.max())

    def test_vmapped_per_stream_tier_selection(self):
        """Tier selection is DATA (a prefetched scalar the kernel
        branches on), so a vmapped batch mixing a tiny and a large
        rotation must give each stream its exact result — the property
        that frees multi-stream serving from the pinned full-envelope
        table (the old lax.cond lowered to every-branch + select)."""
        import jax

        from video_stab_tpu.ops.warp import warp_affine
        from video_stab_tpu.pallas.warp import warp_affine_u8
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.integers(0, 255, (2, 40, 140, 3),
                                        dtype=np.uint8))
        angs = [0.05, 5.2]                   # env/16 tier vs full table
        ms = jnp.stack([
            jnp.array([[np.cos(np.radians(a)), -np.sin(np.radians(a)), 1.3],
                       [np.sin(np.radians(a)), np.cos(np.radians(a)), -0.7]],
                      jnp.float32) for a in angs])
        outs = jax.vmap(
            lambda im, m: warp_affine_u8(im, m, interpret=True))(imgs, ms)
        for i in range(2):
            ref = np.asarray(warp_affine(imgs[i].astype(jnp.float32), ms[i]))
            ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.int64)
            d = np.abs(np.asarray(outs[i]).astype(np.int64) - ref_u8)
            near_tie = np.abs(ref - np.floor(ref) - 0.5) < 1e-3
            assert d[~near_tie].max() == 0, (i, d[~near_tie].max())
            assert d.max() <= 1, (i, d.max())

    def test_half_even_tie_rounding(self):
        """A pure +0.5 px translation on alternating 0/1 pixels produces
        exact .5 bilinear ties everywhere: the kernel must round
        half-to-even (cv2 saturate_cast / jnp.round), not half-up."""
        from video_stab_tpu.pallas.warp import warp_affine_u8
        img = np.zeros((16, 130), np.uint8)
        img[:, 1::2] = 1                    # 0,1,0,1,... -> ties at 0.5
        m = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.0]], jnp.float32)
        out = np.asarray(warp_affine_u8(jnp.asarray(img), m,
                                        interpret=True))
        # interior ties: (0+1)/2 = 0.5 -> round-half-even -> 0
        assert (out[:, 2:-2] == 0).all(), np.unique(out[:, 2:-2])

    def test_single_tier_escape_hatch(self, monkeypatch):
        """VSTAB_WARP_SINGLE_TIER=1 forces the full-envelope single-tier
        kernel (no in-kernel pl.when tier branch) — bench.py's
        Mosaic-compile-failure fallback, structurally the round-3
        TPU-validated kernel. Both paths compute exact bilinear; they
        may differ only at f32 .5-tie pixels (different tap counts
        change the accumulation order)."""
        from video_stab_tpu.ops.warp import warp_affine
        from video_stab_tpu.pallas.warp import warp_affine_u8
        rng = np.random.default_rng(17)
        img = jnp.asarray(rng.integers(0, 255, (40, 140, 3), dtype=np.uint8))
        ang = np.radians(0.8)               # small angle -> tiered path
        m = jnp.array([[np.cos(ang), -np.sin(ang), 1.1],
                       [np.sin(ang), np.cos(ang), -0.6]], jnp.float32)
        ref = np.asarray(warp_affine(img.astype(jnp.float32), m))
        ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.int64)
        near_tie = np.abs(ref - np.floor(ref) - 0.5) < 1e-3
        tiered = np.asarray(warp_affine_u8(img, m, interpret=True))
        # The env check happens at TRACE time (the wrapper is jit-cached),
        # hence bench.py re-execs on fallback; here a cache clear forces
        # the retrace the fresh process would get.
        monkeypatch.setenv("VSTAB_WARP_SINGLE_TIER", "1")
        warp_affine_u8.clear_cache()
        try:
            single = np.asarray(warp_affine_u8(img, m, interpret=True))
        finally:
            warp_affine_u8.clear_cache()   # don't leak single-tier traces
        for out in (tiered, single):
            d = np.abs(out.astype(np.int64) - ref_u8)
            assert d[~near_tie].max() == 0, d[~near_tie].max()
            assert d.max() <= 1, d.max()
        assert np.array_equal(tiered[~near_tie], single[~near_tie])


class TestWarpHomographyKernel:
    """pallas/warp.warp_homography_u8 — projective strip kernel parity vs
    the XLA gather warp (near-identity stabilizing homographies)."""

    def _check(self, hm, shape=(40, 140, 3), seed=6):
        from video_stab_tpu.ops.warp import warp_perspective
        from video_stab_tpu.pallas.warp import warp_homography_u8
        rng = np.random.default_rng(seed)
        img = jnp.asarray(rng.integers(0, 255, shape, dtype=np.uint8))
        ref = np.asarray(warp_perspective(img.astype(jnp.float32),
                                          jnp.asarray(hm)))
        ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.int64)
        out = np.asarray(warp_homography_u8(
            img, jnp.asarray(hm), interpret=True)).astype(np.int64)
        d = np.abs(out - ref_u8)
        # The rational map evaluates through an f32 divide; a ~1e-5 ulp
        # difference in (sx, sy) vs the gather path moves the bilinear
        # value by up to ~255 * 1e-5 — wider near-tie band than affine.
        near_tie = np.abs(ref - np.floor(ref) - 0.5) < 5e-3
        assert d[~near_tie].max() == 0, d[~near_tie].max()
        assert d.max() <= 1
        assert (d > 0).mean() < 0.01, (d > 0).mean()

    def test_small_branch_projective(self):
        ang = np.radians(0.4)
        hm = np.float32([[np.cos(ang), -np.sin(ang), 2.1],
                         [np.sin(ang), np.cos(ang), -1.3],
                         [3e-5, -2e-5, 1.0]])
        self._check(hm)

    def test_large_branch_projective(self):
        ang = np.radians(4.0)
        hm = np.float32([[np.cos(ang), -np.sin(ang), 3.0],
                         [np.sin(ang), np.cos(ang), 2.0],
                         [6e-5, 4e-5, 1.0]])
        self._check(hm, seed=9)

    def test_identity_exact(self):
        from video_stab_tpu.pallas.warp import warp_homography_u8
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.integers(0, 255, (24, 132, 3), dtype=np.uint8))
        out = warp_homography_u8(img, jnp.eye(3), interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
