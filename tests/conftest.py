"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests exercise pjit/shard_map without TPU hardware, and keep the suite
independent of the tunnel-attached TPU."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env may pin JAX_PLATFORMS to a TPU plugin; the config update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    # Persistent compilation cache: XLA CPU compiles of the full pipeline are
    # slow; cache them across test runs. The suite gets its OWN cache dir:
    # sharing .jax_cache with concurrently-running TPU tools once produced a
    # torn cache read that segfaulted the whole run mid-suite.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


def isolated(fn):
    """Run this test in a FRESH pytest subprocess (with the persistent
    compile cache disabled there via env). jaxlib's XLA:CPU compiles
    segfault intermittently LATE in a long-lived suite process —
    especially with another JAX process on the box — while standalone
    runs always pass (observed: test_sharding rounds 2-3,
    test_registration round 4, both cache-read and compile stacks).
    The wrapper preserves the signature so fixtures still resolve in
    the child process."""
    import functools
    import os
    import subprocess
    import sys

    @functools.wraps(fn)
    def wrapper(*a, **k):
        if os.environ.get("_S3D_ISOLATED") == "1":
            return fn(*a, **k)
        env = dict(os.environ)
        env["_S3D_ISOLATED"] = "1"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        mod = sys.modules[fn.__module__].__file__
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{os.path.abspath(mod)}::{fn.__name__}"],
            env=env, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}\n{r.stdout}\n"
            f"{r.stderr}")
    return wrapper


def disable_persistent_cache_fixture():
    """Module-scope autouse fixture body: turn the on-disk compilation
    cache off for compile-heavy modules. jaxlib's persistent-cache
    serialize/deserialize of CPU executables segfaults INTERMITTENTLY
    (cpu_aot_loader machine-feature path; observed in-suite at
    test_sharding round 2-3 and at test_registration's batch path round
    4). In-memory jit caching still applies within the run.

    config.update alone is NOT enough: compilation_cache holds a global
    initialized on first use, so it must be reset to pick up the change
    (and reset again on teardown to re-enable the suite's cache dir)."""
    from jax._src import compilation_cache as cc
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    cc.reset_cache()


def make_phantom(n, rng=None, nblobs=12, seed=7):
    """Synthetic multi-blob phantom: sum of anisotropic Gaussian blobs on a
    smooth background. Deterministic for a given (n, seed)."""
    rr = np.random.default_rng(seed)
    x, y, z = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                          indexing="ij")
    vol = np.zeros((n, n, n), dtype=np.float64)
    for _ in range(nblobs):
        c = rr.uniform(0.15 * n, 0.85 * n, size=3)
        s = rr.uniform(0.02 * n, 0.12 * n, size=3)
        amp = rr.uniform(0.3, 1.0) * rr.choice([-1.0, 1.0])
        vol += amp * np.exp(-(((x - c[0]) / s[0]) ** 2
                              + ((y - c[1]) / s[1]) ** 2
                              + ((z - c[2]) / s[2]) ** 2))
    return vol.astype(np.float32)


def make_sphere_phantom(n, radius_frac=0.3):
    """Hard-edged sphere phantom (BASELINE config 1)."""
    x, y, z = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                          indexing="ij")
    c = (n - 1) / 2.0
    r2 = (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2
    return (r2 <= (radius_frac * n) ** 2).astype(np.float32)
