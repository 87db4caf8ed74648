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
