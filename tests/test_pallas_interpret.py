"""Pallas-vs-scan bit-equality in INTERPRETER mode — runs in the CPU suite.

The CLAUDE.md invariant (banded_align is the oracle; banded_align_pallas
must stay bit-identical) previously only ran when someone drove the verify
skill on real hardware; interpret=True executes the same kernel logic under
the CPU test mesh so every `pytest` enforces it. test_pallas_tpu.py still
covers the Mosaic-compiled path on hardware.
"""

import numpy as np
import jax.numpy as jnp

from blasr_tpu.ops.banded_align import banded_align, make_qoff
from blasr_tpu.ops.banded_pallas import banded_align_pallas


def _problem(seed, I=8, L=96, T=140):
    rng = np.random.default_rng(seed)
    Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
    Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
    for i in range(I):
        Tc[i, 10 : 10 + L - 20] = Q[i, : L - 20]
    qual = rng.integers(3, 45, (I, L)).astype(np.uint8)
    qlen = np.full(I, L, np.int32)
    args = (
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32),
        jnp.asarray(make_qoff(L, T, 128, (T - L) // 2)),
    )
    return args, jnp.asarray(qual)


def test_pallas_interpret_matches_scan_bitexact():
    args, qual = _problem(0)
    for qu in (None, qual):
        ref = banded_align(*args, qu, with_traceback=True)
        got = banded_align_pallas(*args, qu, with_traceback=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(got.score))
        np.testing.assert_array_equal(np.asarray(ref.best_a), np.asarray(got.best_a))
        np.testing.assert_array_equal(np.asarray(ref.best_w), np.asarray(got.best_w))
        np.testing.assert_array_equal(np.asarray(ref.arrows), np.asarray(got.arrows))


def test_pallas_interpret_score_only():
    args, _ = _problem(1)
    ref = banded_align(*args, None, with_traceback=False)
    got = banded_align_pallas(*args, None, with_traceback=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(got.score))
