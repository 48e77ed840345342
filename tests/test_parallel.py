"""Multi-stream serving tests (virtual 8-device mesh via conftest)."""

import numpy as np

from video_stab_tpu.core.params import StabilizerParams
from video_stab_tpu.parallel import MultiStreamStabilizer, make_stream_mesh


# NOTE: full-suite runs used to crash (SIGSEGV/SIGABRT inside XLA:CPU)
# under this module's tests — in compile OR cache serialize/deserialize,
# never reproducible in isolation. Root cause was process-wide
# accumulation of live executables across the whole suite, fixed by the
# per-module jax.clear_caches() in conftest; nothing in this module is
# special beyond being the last big compiles of the run.

SMALL = StabilizerParams(smoothing_radius=5, analysis_width=64,
                         analysis_height=48, max_corners=32,
                         ransac_hypotheses=32)


def _batch(rng, n=4):
    return rng.integers(0, 255, (n, 48, 64, 3), dtype=np.uint8)


class TestMultiStream:
    def test_batched_serving_warmup_and_emit(self):
        ms = MultiStreamStabilizer(SMALL, n_streams=4)
        rng = np.random.default_rng(0)
        outs = 0
        for _ in range(8):
            out = ms.stabilize_batch(_batch(rng))
            if out is not None:
                assert out.shape == (4, 48, 64, 3)
                outs += 1
        assert outs == 4   # emission from tick radius-1 on

    def test_mesh_sharded_serving(self):
        mesh = make_stream_mesh()
        ms = MultiStreamStabilizer(SMALL, n_streams=8, mesh=mesh)
        rng = np.random.default_rng(1)
        out = None
        for _ in range(6):
            out = ms.stabilize_batch(
                rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8))
        assert out is not None and out.shape == (8, 48, 64, 3)

    def test_reset_stream_rewarmup_isolated(self):
        ms = MultiStreamStabilizer(SMALL, n_streams=4)
        rng = np.random.default_rng(2)
        for _ in range(7):
            ms.stabilize_batch(_batch(rng))
        assert ms.last_valid.all()
        ms.reset_stream(2)
        invalid_ticks = 0
        for _ in range(6):
            ms.stabilize_batch(_batch(rng))
            if not ms.last_valid[2]:
                invalid_ticks += 1
            # other streams keep emitting throughout
            assert ms.last_valid[[0, 1, 3]].all()
        assert invalid_ticks == SMALL.effective_radius - 1
        assert ms.last_valid.all()

    def test_batched_redetect_phase_matches_single_stream(self, jittered_clip):
        """The batched step receives the shared frames-in counter as its
        redetect tick; it must fire re-detection on the SAME analyze steps
        as the single-stream path (an off-by-one here overwrites the init
        detection on the very first analyze step). Stream 0 shares the
        single stream's seed; a phase flip swaps a tracked point set for a
        fresh quality-0.02 detection, moving points by many pixels — the
        sub-pixel tolerance below only absorbs vmap-fusion rounding."""
        from video_stab_tpu.core.stabilizer import Stabilizer

        frames, _ = jittered_clip
        p = StabilizerParams(smoothing_radius=5, analysis_width=128,
                             analysis_height=96, max_corners=64,
                             ransac_hypotheses=64)
        single = Stabilizer(p)
        ms = MultiStreamStabilizer(p, n_streams=2)
        for f in frames[:6]:
            single.stabilize(f)
            ms.stabilize_batch(np.stack([f, f]))
            ps = np.asarray(single._state.prev_pts)
            pb = np.asarray(ms._state.prev_pts[0])
            mk = (np.asarray(single._state.prev_mask)
                  & np.asarray(ms._state.prev_mask[0]))
            assert mk.sum() >= 8
            assert np.abs(ps - pb)[mk].max() < 0.5

    def test_batched_deepstab_serving_runs(self):
        """deep_stabilization in batched serving: the multi-stream init must
        resolve the learned-estimator weights (it once left the empty
        pytree and crashed the first vmapped trace)."""
        p = StabilizerParams(smoothing_radius=5, analysis_width=64,
                             analysis_height=48, max_corners=32,
                             ransac_hypotheses=32, deep_stabilization=True)
        ms = MultiStreamStabilizer(p, n_streams=2)
        rng = np.random.default_rng(4)
        out = None
        for _ in range(6):
            out = ms.stabilize_batch(_batch(rng, n=2))
        assert out is not None and out.shape == (2, 48, 64, 3)
        ms.reset_stream(1)      # fresh slot keeps the weight leaves
        ms.stabilize_batch(_batch(rng, n=2))

    def test_batched_matches_single_stream(self, jittered_clip):
        """The vmapped batched step (with the unbatched redetect tick)
        must reproduce the single-stream behavior for lockstep streams.
        RANSAC keys differ per stream (seed + i, independent streams) and
        cross-program rounding can flip borderline inliers, so the
        equivalence is behavioral — the recovered corrections agree to a
        fraction of a pixel on featureful content — not bitwise."""
        from video_stab_tpu.core.stabilizer import Stabilizer

        frames, _ = jittered_clip
        frames = frames[:14]
        p = StabilizerParams(smoothing_radius=5, analysis_width=128,
                             analysis_height=96, max_corners=64,
                             ransac_hypotheses=64)
        single = Stabilizer(p)
        singles = [o for f in frames
                   if (o := single.stabilize(f)) is not None]

        ms = MultiStreamStabilizer(p, n_streams=2)
        batched = []
        for f in frames:
            out = ms.stabilize_batch(np.stack([f, f]))
            if out is not None and ms.last_valid.all():
                batched.append(out)
        assert len(batched) == len(singles)
        for s, b in zip(singles, batched):
            mad0 = np.abs(s.astype(np.float32) - b[0].astype(np.float32)
                          )[8:-8, 8:-8].mean()
            mad01 = np.abs(b[0].astype(np.float32)
                           - b[1].astype(np.float32))[8:-8, 8:-8].mean()
            assert mad0 < 6.0, mad0
            assert mad01 < 6.0, mad01


class TestRemoteIngestServing:
    def test_eight_stream_ingest_fanin_to_batched_step(self):
        """The serving-host main loop end-to-end (VERDICT r4 #8): 8 ingest
        senders (JPEG-over-TCP, io.remote) fan into a RemoteFrameServer,
        serve_remote_streams assembles lockstep batches and drives ONE
        batched device dispatch per tick, and every stream receives
        stabilized output after warm-up. Reference counterpart: 8 CamCap
        NVDEC pipelines feeding per-process stabilizers
        (CamCap.cpp:22-77)."""
        from video_stab_tpu.io.remote import (RemoteFrameServer,
                                              RemoteFrameSink)
        from video_stab_tpu.parallel.multistream import serve_remote_streams

        # Queue depth covers the whole pre-fed clip: the senders run
        # ahead of the serving loop here, and a latest-only-shallow queue
        # would drop the early frames and stall every later tick on the
        # read timeout + last-frame fallback.
        srv = RemoteFrameServer(port=15941, queue_size=16).start()
        sinks = []
        try:
            rng = np.random.default_rng(3)
            sinks = [RemoteFrameSink("127.0.0.1", 15941, stream_id=i,
                                     quality=90) for i in range(8)]
            n_ticks = SMALL.effective_radius + 3
            # Pre-feed a couple of frames per stream, then keep feeding
            # ahead of the consumer (the ingest hosts run ahead of the
            # serving tick in production).
            clips = [[rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                      for _ in range(n_ticks + 2)] for _ in range(8)]
            for t in range(n_ticks + 2):
                for i, s in enumerate(sinks):
                    s.write(clips[i][t])

            # Same mesh-sharded 8-stream programs test_mesh_sharded_serving
            # compiles (in-process jit cache hit keeps this integration
            # test cheap) — and the meshed path IS the serving deployment.
            ms = MultiStreamStabilizer(SMALL, n_streams=8,
                                       mesh=make_stream_mesh())
            got = {}

            def on_output(sid, frame):
                got.setdefault(sid, 0)
                got[sid] += 1
                assert frame.shape == (48, 64, 3)

            stats = serve_remote_streams(srv, ms, list(range(8)),
                                         n_ticks, on_output=on_output)
            assert stats["ticks"] == n_ticks
            # Every stream emitted after the shared warm-up.
            assert sorted(got) == list(range(8)), got
            assert all(v >= 2 for v in got.values()), got
            assert (stats["emitted"] >= 2).all(), stats
        finally:
            for s in sinks:
                s.close()
            srv.stop()
