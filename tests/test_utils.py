"""Utils tests: checkpointing, telemetry."""

import numpy as np

from video_stab_tpu.utils.checkpoint import load_state, save_state
from video_stab_tpu.utils.telemetry import FpsMeter, Metrics, StageTimer


class TestCheckpoint:
    def test_stabilizer_state_file_roundtrip(self, tmp_path, jittered_clip):
        from video_stab_tpu import Stabilizer, StabilizerParams
        frames, _ = jittered_clip
        p = StabilizerParams(smoothing_radius=6, analysis_width=128,
                             analysis_height=96, max_corners=64,
                             ransac_hypotheses=64)
        st = Stabilizer(p)
        for f in frames[:8]:
            st.stabilize(f)
        path = str(tmp_path / "stream.npz")
        save_state(st._state, path)
        a = st.stabilize(frames[8])

        from video_stab_tpu.core.state import stabilizer_state_init
        h, w = frames[0].shape[:2]
        template = stabilizer_state_init(p, h, w)
        st2 = Stabilizer(p)
        st2.load_state_dict(load_state(path, template), h, w)
        b = st2.stabilize(frames[8])
        assert np.array_equal(a, b)    # bit-exact resume

    def test_shape_mismatch_rejected(self, tmp_path):
        import jax.numpy as jnp
        path = str(tmp_path / "s.npz")
        save_state({"a": jnp.zeros((3, 3))}, path)
        try:
            load_state(path, {"a": jnp.zeros((4, 4))})
            assert False, "should have raised"
        except ValueError:
            pass


class TestTelemetry:
    def test_stage_timer_and_metrics(self):
        m = Metrics()
        with m.timer.stage("warp"):
            pass
        m.inc("frames_out", 3)
        m.set("inlier_ratio", 0.9)
        snap = m.snapshot()
        assert snap["counters"]["frames_out"] == 3
        assert snap["gauges"]["inlier_ratio"] == 0.9
        assert "warp" in snap["stages"]
        assert snap["stages"]["warp"]["n"] == 1

    def test_fps_meter(self):
        f = FpsMeter()
        assert f.tick() == 0.0
        assert f.tick() > 0.0


class TestBenchInroundRecord:
    """bench.py's in-round record is what the outage fallback replays in
    the official driver artifact — its write path must be load-bearing."""

    def test_write_and_replay_roundtrip(self, tmp_path):
        import importlib.util
        import json
        import os
        import sys

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        sys.modules["bench"] = bench
        spec.loader.exec_module(bench)

        out = {"value": 512.3, "ms_per_frame_1080p_amortized": 1.95,
               "fps_4k": 270.0, "fps_8x1080p_aggregate": 460.0,
               "fps_1080p_chain": None,            # omitted when null
               "latency_tunnel_bound": False,
               "degraded_runtime": False,
               "warp_single_tier_fallback": False}
        path = tmp_path / "BENCH_INROUND.json"
        rec = bench.write_inround_record(out, path=str(path))
        on_disk = json.loads(path.read_text())
        assert on_disk == rec
        assert on_disk["stabilized_fps_1080p"] == 512.3
        assert "fps_1080p_chain" not in on_disk
        assert on_disk["latency_tunnel_bound"] is False
        assert on_disk["provenance"].startswith("in-round measurement")
        assert on_disk["commit"] and on_disk["commit"] != "unknown"
