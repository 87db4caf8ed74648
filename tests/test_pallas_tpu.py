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


def test_pallas_guided_band_tpu():
    """Guided mode on real hardware (per-item knot schedules, 4-block
    fetch, bit-decomposed per-item rolls): scores, arrows and the knot-walk
    must bit-match the (S, I) XLA oracle. Mirrors
    test_guided.test_guided_pallas_interpret_matches_oracle, which only
    proved interpret-mode equality."""
    from blasr_tpu.ops.banded_align import (
        QOFF_NUM_HALF, banded_align, clamp_knots_to_shared, make_qoff,
        make_qoff_knots, qoff_from_knots,
    )
    from blasr_tpu.ops.banded_pallas import banded_align_pallas
    from blasr_tpu.ops.traceback_device import walk_arrows_device

    rng = np.random.default_rng(19)
    I, W = 6, 128
    L = 512
    pad2 = 128
    T = L + 2 * pad2
    S = L + T - 1
    Q = np.full((I, L), 4, np.uint8)
    Tc = np.full((I, T), 5, np.uint8)
    qlen = np.zeros(I, np.int32)
    aq_all = np.zeros((I, 8), np.int32)
    at_all = np.zeros((I, 8), np.int32)
    msk = np.zeros((I, 8), bool)
    for i in range(I):
        tpl = rng.integers(0, 4, 400).astype(np.uint8)
        if i % 3 == 0:
            q = np.concatenate(
                [tpl[:200], rng.integers(0, 4, 60).astype(np.uint8), tpl[200:]]
            )
        elif i % 3 == 1:
            q = np.concatenate([tpl[:150], tpl[210:]])
        else:
            q = tpl.copy()
        mut = rng.random(len(q)) < 0.04
        q = q.copy()
        q[mut] = (q[mut] + rng.integers(1, 4, mut.sum())) % 4
        Q[i, : len(q)] = q
        qlen[i] = len(q)
        Tc[i, pad2 : pad2 + 400] = tpl
        Tc[i, :pad2] = rng.integers(0, 4, pad2)
        Tc[i, pad2 + 400 :] = rng.integers(0, 4, T - pad2 - 400)
        for k in range(8):
            p = 40 * k + 10
            qp = p
            if i % 3 == 0 and p >= 200:
                qp = p + 60
            elif i % 3 == 1 and p >= 150:
                if p < 210:
                    continue
                qp = p - 60
            aq_all[i, k] = qp
            at_all[i, k] = pad2 + p
            msk[i, k] = True
    qoff_shared = make_qoff(L, T, W, pad2)
    knots = make_qoff_knots(
        jnp.asarray(aq_all + at_all), jnp.asarray(aq_all - W // 2),
        jnp.asarray(msk), S, L, W, diag=pad2, num=QOFF_NUM_HALF,
    )
    knots = clamp_knots_to_shared(knots, jnp.asarray(qoff_shared), W)
    qoff2 = qoff_from_knots(knots, S)
    r_o = banded_align(
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32), qoff2,
        with_traceback=True, band_width=W,
    )
    r_p = banded_align_pallas(
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32),
        jnp.asarray(qoff_shared),
        with_traceback=True, band_width=W, qoff_knots=knots,
    )
    np.testing.assert_array_equal(np.asarray(r_o.score), np.asarray(r_p.score))
    np.testing.assert_array_equal(np.asarray(r_o.best_a), np.asarray(r_p.best_a))
    np.testing.assert_array_equal(np.asarray(r_o.best_w), np.asarray(r_p.best_w))
    np.testing.assert_array_equal(
        np.asarray(r_o.arrows), np.asarray(r_p.arrows)[:, :I, :]
    )
    # knot-walk over the silicon arrows == knot-walk over the oracle arrows
    wo = walk_arrows_device(
        r_o.arrows, jnp.asarray(qoff_shared), r_o.best_a, r_o.best_w,
        r_o.score, jnp.asarray(Q), jnp.asarray(Tc), qoff_knots=knots,
    )
    wp = walk_arrows_device(
        r_p.arrows, jnp.asarray(qoff_shared), r_p.best_a, r_p.best_w,
        r_p.score, jnp.asarray(Q), jnp.asarray(Tc), qoff_knots=knots,
    )
    for f in ("nops", "q_start", "q_end", "t_start", "t_end",
              "n_match", "n_mismatch", "n_ins", "n_del"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wo, f)), np.asarray(getattr(wp, f)), err_msg=f
        )


@pytest.mark.parametrize("W", [32, 64])
def test_pallas_chunked_guided_tpu(W):
    """CHUNKED guided narrow band on real hardware (P = 128//W items per
    row in contiguous W-lane chunks, per-item knot schedules): scores,
    arrows and the chunk-layout knot-walk must bit-match the (S, I) XLA
    oracle. Mirrors test_guided.test_chunked_guided_pallas_interpret...,
    which only proved interpret-mode equality."""
    from blasr_tpu.ops.banded_align import (
        QOFF_NUM_HALF, banded_align, clamp_knots_to_shared, make_qoff,
        make_qoff_knots, qoff_from_knots,
    )
    from blasr_tpu.ops.banded_pallas import _guided_geometry, banded_align_pallas
    from blasr_tpu.ops.traceback_device import walk_arrows_device

    rng = np.random.default_rng(23)
    P = 128 // W
    I = 2 * P + 1
    L = 512
    pad2 = 64
    T = L + 2 * pad2
    S = L + T - 1
    Q = np.full((I, L), 4, np.uint8)
    Tc = np.full((I, T), 5, np.uint8)
    qlen = np.zeros(I, np.int32)
    aq_all = np.zeros((I, 8), np.int32)
    at_all = np.zeros((I, 8), np.int32)
    msk = np.zeros((I, 8), bool)
    for i in range(I):
        tpl = rng.integers(0, 4, 400).astype(np.uint8)
        if i % 3 == 0:
            q = np.concatenate(
                [tpl[:200], rng.integers(0, 4, 50).astype(np.uint8), tpl[200:]]
            )
        elif i % 3 == 1:
            q = np.concatenate([tpl[:150], tpl[200:]])
        else:
            q = tpl.copy()
        mut = rng.random(len(q)) < 0.04
        q = q.copy()
        q[mut] = (q[mut] + rng.integers(1, 4, mut.sum())) % 4
        Q[i, : len(q)] = q
        qlen[i] = len(q)
        Tc[i, pad2 : pad2 + 400] = tpl
        Tc[i, :pad2] = rng.integers(0, 4, pad2)
        Tc[i, pad2 + 400 :] = rng.integers(0, 4, T - pad2 - 400)
        for k in range(8):
            p = 40 * k + 10
            qp = p
            if i % 3 == 0 and p >= 200:
                qp = p + 50
            elif i % 3 == 1 and p >= 150:
                if p < 200:
                    continue
                qp = p - 50
            aq_all[i, k] = qp
            at_all[i, k] = pad2 + p
            msk[i, k] = True
    qoff_shared = make_qoff(L, T, W, pad2)
    knots = make_qoff_knots(
        jnp.asarray(aq_all + at_all), jnp.asarray(aq_all - W // 2),
        jnp.asarray(msk), S, L, W, diag=pad2, num=QOFF_NUM_HALF,
    )
    _, mL = _guided_geometry(True, P, W)
    knots = clamp_knots_to_shared(
        knots, jnp.asarray(qoff_shared), W, max_dev=mL * W - 8
    )
    qoff2 = qoff_from_knots(knots, S)
    r_o = banded_align(
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32), qoff2,
        with_traceback=True, band_width=W,
    )
    r_p = banded_align_pallas(
        jnp.asarray(Q), jnp.asarray(qlen), jnp.asarray(Tc),
        jnp.zeros(I, jnp.int32), jnp.full(I, T, jnp.int32),
        jnp.asarray(qoff_shared),
        with_traceback=True, band_width=W, qoff_knots=knots,
    )
    np.testing.assert_array_equal(np.asarray(r_o.score), np.asarray(r_p.score))
    np.testing.assert_array_equal(np.asarray(r_o.best_a), np.asarray(r_p.best_a))
    np.testing.assert_array_equal(np.asarray(r_o.best_w), np.asarray(r_p.best_w))
    ar_p = np.asarray(r_p.arrows)
    Sp, R, LW = ar_p.shape
    np.testing.assert_array_equal(
        np.asarray(r_o.arrows), ar_p.reshape(Sp, R * P, W)[:, :I, :]
    )
    wc = walk_arrows_device(
        r_p.arrows, jnp.asarray(qoff_shared), r_p.best_a, r_p.best_w,
        r_p.score, jnp.asarray(Q), jnp.asarray(Tc),
        qoff_knots=knots, pack=P, pack_layout="chunk",
    )
    wo = walk_arrows_device(
        r_o.arrows, qoff2[:, 0], r_o.best_a, r_o.best_w, r_o.score,
        jnp.asarray(Q), jnp.asarray(Tc), qoff_knots=knots,
    )
    for f in ("nops", "q_start", "q_end", "t_start", "t_end",
              "n_match", "n_mismatch", "n_ins", "n_del"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wc, f)), np.asarray(getattr(wo, f)), err_msg=f
        )


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


def test_dma_gather_tpu():
    """Silicon check for the per-item DMA gathers (ops/dma_gather): exact
    vs the XLA gather on the real chip, at the bench genome-window shape."""
    from blasr_tpu.ops.dma_gather import gather_rows, gather_spans

    rng = np.random.default_rng(7)
    N, I, S = 600_064, 512, 162
    src = jnp.asarray(rng.integers(0, 2**31 - 1, N).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, N - (-(-S // 128) + 1) * 128, I).astype(np.int32))
    out = np.asarray(gather_spans(src, starts, span=S))
    ref = np.asarray(src)[
        np.asarray(starts)[:, None] + np.arange(S)[None, :]
    ]
    np.testing.assert_array_equal(out, ref)

    R, Lr = 512, 128
    tbl = jnp.asarray(
        rng.integers(0, 2**31 - 1, (R, Lr)).astype(np.int32))
    rows = jnp.asarray(rng.integers(0, R, I).astype(np.int32))
    outr = np.asarray(gather_rows(tbl, rows))
    np.testing.assert_array_equal(outr, np.asarray(tbl)[np.asarray(rows)])
