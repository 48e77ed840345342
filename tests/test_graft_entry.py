"""Driver entry-point robustness: the multichip dryrun must complete even
when the accelerator backend is dead (VERDICT r3 #1a — the round-3
MULTICHIP artifact regressed to rc:124 because jax.devices() hung in the
parent process on the dead axon tunnel)."""

import importlib.util
import os
import sys

import pytest

_ENTRY = os.path.join(os.path.dirname(__file__), os.pardir,
                      "__graft_entry__.py")


def _load_entry_module():
    spec = importlib.util.spec_from_file_location("graft_entry", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_times_out_to_zero():
    """A hung backend init maps to count 0, never a hang in the caller."""
    mod = _load_entry_module()
    assert mod._probe_device_count(timeout_s=1e-4) == 0


def test_probe_counts_devices_in_this_env():
    """In the test env (8 virtual CPU devices) the probe sees all 8."""
    mod = _load_entry_module()
    assert mod._probe_device_count(timeout_s=240.0) == 8


def test_dryrun_multichip_survives_dead_backend(monkeypatch):
    """With the backend probe reporting failure (dead axon tunnel) and no
    JAX_PLATFORMS hint, dryrun_multichip must self-provision the CPU-mesh
    subprocess and complete — the exact outage that produced
    MULTICHIP_r03 ok:false rc:124."""
    mod = _load_entry_module()
    calls = []

    def dead_probe(timeout_s=240.0):
        calls.append(timeout_s)
        return 0

    monkeypatch.setattr(mod, "_probe_device_count", dead_probe)
    # Simulate the driver's environment: no cpu-platform hint, so the
    # in-process jax.devices() shortcut is unavailable and the probe is
    # the only safe decision path.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    # Reuse the suite's persistent compile cache in the child so this
    # integration test stays cheap on warm runs (host-keyed subdir —
    # the plain root holds no entries, utils/cache.py).
    from video_stab_tpu.utils.cache import compilation_cache_dir
    monkeypatch.setenv(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir,
                                     compilation_cache_dir(".jax_cache"))))
    # The decision path under test (probe -> CPU-mesh subprocess) is fully
    # exercised by the serving step; skip the child's training-step compile
    # (~20 s). The driver's own MULTICHIP run covers both parts.
    monkeypatch.setenv("VSTAB_DRYRUN_SERVING_ONLY", "1")
    mod.dryrun_multichip(2)   # subprocess.run(check=True) raises on failure
    assert calls, "probe was not consulted before touching jax.devices()"
