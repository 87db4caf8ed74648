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


def _problem_w(seed, W, I=8, L=96, T=140, num=None):
    from blasr_tpu.ops.banded_align import make_qoff_num

    rng = np.random.default_rng(seed)
    Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
    Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
    for i in range(I):
        Tc[i, 10 : 10 + L - 20] = Q[i, : L - 20]
    qlen = np.full(I, L, np.int32)
    if num is None:
        qoff = jnp.asarray(make_qoff(L, T, W, (T - L) // 2))
    else:
        qoff = make_qoff_num(L, T, W, (T - L) // 2, num)
    return (
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32), qoff,
    )


def test_pallas_interpret_packed_narrow_bands():
    """Packed narrow bands (P = 128//W items interleaved per lane row)
    match the XLA oracle bit-exactly, including the walked paths through
    the interleaved arrow tensor."""
    from blasr_tpu.ops.traceback_device import walk_arrows_device

    for W, seed in ((64, 2), (32, 3)):
        args = _problem_w(seed, W, I=8)
        ref = banded_align(*args, None, with_traceback=True, band_width=W)
        got = banded_align_pallas(
            *args, None, with_traceback=True, band_width=W, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(got.score))
        np.testing.assert_array_equal(np.asarray(ref.best_a), np.asarray(got.best_a))
        np.testing.assert_array_equal(np.asarray(ref.best_w), np.asarray(got.best_w))

        # walk both arrow tensors (packed layout for the pallas one)
        Q, qlen, Tc, tlo, thi, qoff = args
        P = 128 // W
        wr = walk_arrows_device(ref.arrows, qoff, ref.best_a, ref.best_w,
                                ref.score, Q, Tc)
        wg = walk_arrows_device(got.arrows, qoff, got.best_a, got.best_w,
                                got.score, Q, Tc, pack=P)
        for f in ("nops", "q_start", "q_end", "t_start", "t_end",
                  "n_match", "n_mismatch", "n_ins", "n_del"):
            np.testing.assert_array_equal(
                np.asarray(getattr(wr, f)), np.asarray(getattr(wg, f)), err_msg=f
            )
        np.testing.assert_array_equal(
            np.asarray(wr.moves_codes), np.asarray(wg.moves_codes)
        )


def test_pallas_interpret_sloped_qoff():
    """Drift-slope schedule (make_qoff_num) through the packed kernel and
    the walk's rational analytic qoff agree with the oracle."""
    from blasr_tpu.ops.banded_align import QOFF_SHIFT
    from blasr_tpu.ops.traceback_device import walk_arrows_device

    num = jnp.int32(round((1 << QOFF_SHIFT) / (2.0 - 0.04)))
    W = 64
    args = _problem_w(5, W, I=8, num=num)
    ref = banded_align(*args, None, with_traceback=True, band_width=W)
    got = banded_align_pallas(
        *args, None, with_traceback=True, band_width=W, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(got.score))
    Q, qlen, Tc, tlo, thi, qoff = args
    L, T = Q.shape[1], Tc.shape[1]
    # analytic rational qoff must equal the table-driven walk
    wt = walk_arrows_device(ref.arrows, qoff, ref.best_a, ref.best_w,
                            ref.score, Q, Tc)
    wa = walk_arrows_device(ref.arrows, qoff, ref.best_a, ref.best_w,
                            ref.score, Q, Tc,
                            qoff_params=((T - L) // 2, W, L), qoff_num=num)
    for f in ("nops", "q_start", "q_end", "t_start", "t_end", "n_match"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wt, f)), np.asarray(getattr(wa, f)), err_msg=f
        )


def test_dma_gather_interpret_matches_xla():
    """gather_spans / gather_rows (per-item DMA fetch, ops/dma_gather)
    must equal the plain XLA gather formulation — interpret mode."""
    import numpy as np
    import jax.numpy as jnp

    from blasr_tpu.ops.dma_gather import gather_rows, gather_spans

    rng = np.random.default_rng(3)
    N, I, S = 4096, 70, 162
    src = jnp.asarray(rng.integers(0, 2**31 - 1, N).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, N - (-(-S // 128) + 1) * 128, I).astype(np.int32))
    out = np.asarray(gather_spans(src, starts, span=S, interpret=True))
    ref = np.asarray(src)[
        np.asarray(starts)[:, None] + np.arange(S)[None, :]
    ]
    np.testing.assert_array_equal(out, ref)
    # clipped start reads in-range data from the clip point
    st2 = jnp.asarray(np.array([N - 10, 0, 5], np.int32))
    out2 = np.asarray(gather_spans(src, st2, span=S, interpret=True))
    lo = np.asarray(jnp.clip(st2, 0, N - (-(-S // 128) + 1) * 128))
    ref2 = np.asarray(src)[lo[:, None] + np.arange(S)[None, :]]
    np.testing.assert_array_equal(out2, ref2)

    R, Lr = 96, 416
    tbl = jnp.asarray(
        rng.integers(0, 2**31 - 1, (R, Lr)).astype(np.int32))
    rows = jnp.asarray(rng.integers(0, R, I).astype(np.int32))
    outr = np.asarray(gather_rows(tbl, rows, interpret=True))
    np.testing.assert_array_equal(outr, np.asarray(tbl)[np.asarray(rows)])
