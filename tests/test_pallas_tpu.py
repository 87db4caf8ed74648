"""Pallas-vs-scan bit-equality — runs only where a TPU backend exists.

(The CPU test mesh exercises the scan path; this file keeps the Pallas
kernel honest when the suite runs on real hardware.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs TPU backend"
)


def test_pallas_matches_scan_bitexact():
    from blasr_tpu.ops.banded_align import AlignScores, banded_align, make_qoff
    from blasr_tpu.ops.banded_pallas import banded_align_pallas

    rng = np.random.default_rng(0)
    I, L, T = 32, 200, 260
    Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
    Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
    for i in range(I):
        Tc[i, 20:170] = Q[i, :150]
    qual = rng.integers(3, 45, (I, L)).astype(np.uint8)
    qlen = np.full(I, L, np.int32)
    args = (
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32),
        jnp.asarray(make_qoff(L, T, 128, (T - L) // 2)),
    )
    for qu in (None, jnp.asarray(qual)):
        ref = banded_align(*args, qu, with_traceback=True)
        got = banded_align_pallas(*args, qu, with_traceback=True)
        np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(got.score))
        np.testing.assert_array_equal(np.asarray(ref.arrows), np.asarray(got.arrows))
