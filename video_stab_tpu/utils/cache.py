"""Host-keyed persistent-compilation-cache location.

XLA:CPU AOT executables embed the feature set of the machine that
compiled them, and loading an entry produced on a different host can
crash outright (observed: a full-suite run segfaulted inside
``compilation_cache.get_executable_and_time`` on a foreign entry; the
cpu_aot_loader had been warning "could lead to execution errors such as
SIGILL" about exactly those entries). JAX's cache key does not include
the host CPU features, so a shared ``.jax_cache`` directory is only
safe per-machine. ``compilation_cache_dir()`` keys the directory by a
fingerprint of the CPU flags so entries written by another box are
never even visible.
"""

import hashlib
import os
import platform

_FINGERPRINT = None


def host_fingerprint() -> str:
    """Short stable id of this host's instruction-set surface."""
    global _FINGERPRINT
    if _FINGERPRINT is None:
        basis = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        basis += " " + " ".join(sorted(line.split()[2:]))
                        break
        except OSError:
            basis += " " + platform.processor()
        _FINGERPRINT = hashlib.sha1(basis.encode()).hexdigest()[:12]
    return _FINGERPRINT


def compilation_cache_dir(root: str = ".jax_cache") -> str:
    """Per-host subdirectory of ``root`` for jax_compilation_cache_dir."""
    return os.path.join(root, "host-" + host_fingerprint())
