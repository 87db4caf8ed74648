"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os
import sys

# `pytest tests/test_pallas_tpu.py` (the kernel-equality invariant) runs on
# the real TPU backend; anything else runs on the virtual 8-device CPU mesh.
# (sys.argv gating because shell env vars don't survive this sandbox.)
_TPU_RUN = any("test_pallas_tpu" in a for a in sys.argv)

if not _TPU_RUN:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # No persistent XLA cache on the CPU test backend: concurrent shard
    # threads (parallel/sharded.py) deserializing the same cache entry
    # segfault in jax's _cache_read, and CPU compiles are cheap anyway.
    # The cache stays on for real-TPU runs, where it saves minutes.
    os.environ["BLASR_TPU_NO_CACHE"] = "1"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# import time; override it back to CPU before any backend initializes so the
# test suite runs on the virtual 8-device CPU mesh, not through the TPU tunnel.
if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from blasr_tpu.core.encode import seq_to_codes  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    A single serial run of the whole suite accumulates hundreds of live
    XLA:CPU executables in one process; past a threshold, a *later*
    compilation (observed: threaded map_batch compile in the sharded
    tests) segfaults inside backend_compile_and_load. Releasing compiled
    programs per module keeps the process under that threshold; xdist
    runs are unaffected (fresh workers).
    """
    yield
    import jax

    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_genome(rng, n, seed_offset=0):
    return rng.integers(0, 4, size=n).astype(np.uint8)


def mutate_read(rng, genome, start, length, sub=0.05, ins=0.06, dele=0.04):
    """Sample a PacBio-like noisy read from genome[start:start+length]."""
    out = []
    i = start
    end = min(start + length, len(genome))
    while i < end:
        r = rng.random()
        if r < ins:
            out.append(rng.integers(0, 4))
        elif r < ins + dele:
            i += 1
        elif r < ins + dele + sub:
            out.append((genome[i] + 1 + rng.integers(0, 3)) % 4)
            i += 1
        else:
            out.append(genome[i])
            i += 1
    return np.asarray(out, dtype=np.uint8)


@pytest.fixture(scope="session")
def small_genome(rng):
    return random_genome(rng, 20000)
