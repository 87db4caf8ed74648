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


def test_pallas_packed_narrow_band_tpu():
    """Packed W=64 (two items interleaved per lane row) on real hardware:
    scores and walked paths bit-match the XLA oracle."""
    from blasr_tpu.ops.banded_align import banded_align, make_qoff_num
    from blasr_tpu.ops.banded_pallas import banded_align_pallas
    from blasr_tpu.ops.traceback_device import walk_arrows_device

    rng = np.random.default_rng(7)
    I, L, T, W = 32, 200, 260, 64
    Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
    Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
    for i in range(I):
        Tc[i, 20:170] = Q[i, :150]
    qlen = np.full(I, L, np.int32)
    num = jnp.int32(round(65536 / (2.0 - 0.04)))
    qoff = make_qoff_num(L, T, W, (T - L) // 2, num)
    args = (
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32), qoff,
    )
    ref = banded_align(*args, None, with_traceback=True, band_width=W)
    got = banded_align_pallas(*args, None, with_traceback=True, band_width=W)
    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(got.score))
    np.testing.assert_array_equal(np.asarray(ref.best_a), np.asarray(got.best_a))
    np.testing.assert_array_equal(np.asarray(ref.best_w), np.asarray(got.best_w))
    wr = walk_arrows_device(ref.arrows, qoff, ref.best_a, ref.best_w,
                            ref.score, args[0], args[2])
    wg = walk_arrows_device(got.arrows, qoff, got.best_a, got.best_w,
                            got.score, args[0], args[2], pack=128 // W,
                            qoff_params=((T - L) // 2, W, L), qoff_num=num)
    for f in ("nops", "q_start", "q_end", "t_start", "t_end",
              "n_match", "n_mismatch", "n_ins", "n_del"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wr, f)), np.asarray(getattr(wg, f)), err_msg=f
        )
