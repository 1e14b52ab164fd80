"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms at interpreter start; the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-forward compiles dominate test time.
# The dir is keyed by the HOST CPU's feature set: XLA:CPU AOT executables
# bake in the compile machine's features, and loading one on a host with
# fewer features (this dev VM migrates between machine types) segfaults
# inside compilation_cache._cache_read ("+prefer-no-scatter is not
# supported on the host machine ... SIGILL" — observed as a mid-suite
# SIGSEGV in whichever test first hits a stale entry).
import hashlib


def _host_cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "unknown"


jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{_host_cpu_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def random_flow(rng):
    """A smooth-ish random flow field [H, W, 2]."""
    h, w = 48, 64
    flow = rng.normal(0.0, 8.0, size=(h, w, 2)).astype(np.float32)
    return flow


@pytest.fixture
def random_frame(rng):
    return rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state after each test module.

    The XLA:CPU backend segfaults NONDETERMINISTICALLY in
    backend_compile_and_load / compilation-cache reads once a few
    hundred compiled programs have accumulated in one process (the
    crash roams: it struck whichever heavy pjit compile came late in
    the suite — train step, multichip dryrun, then a plain engine
    forward; docs/ROUND5_NOTES.md §10).  Dropping the jit caches (and
    collecting the executables they pin) between modules keeps the
    live-program count bounded; the persistent disk cache makes any
    cross-module recompiles cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
