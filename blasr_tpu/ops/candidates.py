"""Candidate-interval selection from anchors (L3).

Role of reference ``common/algorithms/anchoring/FindMaxInterval.h``
(StoreLargestIntervals :395-540 windowed clustering + FindMaxIncreasingInterval
:661-844 chaining + WeightedIntervalSet top-nCandidates) — re-designed as a
fully vectorized diagonal-window sweep:

  1. each anchor (t, q) lies on genome diagonal d = t - q; a correct mapping's
     anchors cluster within a diagonal window of width ~= DP band
  2. per read, sort anchors by d and compute, for every anchor i, the summed
     anchor weight inside the window [d_i, d_i + win)  — one cumulative sum +
     one vectorized binary search
  3. pick the top-C windows by weight with non-maximum suppression (a small
     static python loop of C argmax/mask steps, fully batched over reads)

Weight = sum of 1/nhits per anchor, approximating the reference's p-value
weighting (LISPValueWeightor, LISPValue.h:86+) where rarer k-mers carry more
evidence. The DP band downstream absorbs anything the window blurs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Candidates(NamedTuple):
    """Per-(read-row, candidate): a target window to align against.

    All arrays shaped (B, C).
    """

    d0: jax.Array       # int32 representative diagonal (weighted mean)
    q_lo: jax.Array     # int32 min read pos among member anchors
    q_hi: jax.Array     # int32 max read pos + k among member anchors
    weight: jax.Array   # f32 summed anchor weight
    n_anchors: jax.Array  # int32 member count
    valid: jax.Array    # bool


@functools.partial(jax.jit, static_argnames=("n_candidates", "win", "k"))
def select_candidates(
    t: jax.Array,        # (B, A) int32 anchor genome pos
    q: jax.Array,        # (B, A) int32 anchor read pos
    weight: jax.Array,   # (B, A) f32 per-anchor evidence weight (see
                         # anchor_weights below — the weightor's output)
    valid: jax.Array,    # (B, A) bool
    *,
    n_candidates: int,
    win: int,            # diagonal window width (~ DP band width)
    k: int,              # anchor k-mer length
) -> Candidates:
    B, A = t.shape
    BIG = jnp.int32(2**30)

    d = t - q
    w = jnp.where(valid, weight, 0.0)

    order = jnp.argsort(jnp.where(valid, d, BIG), axis=1)
    ds = jnp.take_along_axis(d, order, axis=1)
    ds = jnp.where(jnp.take_along_axis(valid, order, axis=1), ds, BIG)
    ws = jnp.take_along_axis(w, order, axis=1)
    qs = jnp.take_along_axis(q, order, axis=1)

    csum = jnp.cumsum(ws, axis=1)                     # inclusive
    csum0 = jnp.concatenate([jnp.zeros((B, 1), ws.dtype), csum], axis=1)
    # window [ds_i, ds_i + win): end index per row via batched searchsorted
    hi_idx = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))(ds, ds + win)
    ar = jnp.arange(A, dtype=jnp.int32)[None, :]
    win_w = jnp.take_along_axis(csum0, hi_idx, axis=1) - jnp.take_along_axis(
        csum0, ar, axis=1
    )                                                  # (B, A)
    win_w = jnp.where(ds < BIG, win_w, -1.0)

    cnt_csum0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum((ds < BIG).astype(jnp.int32), axis=1)],
        axis=1,
    )

    score = win_w
    d0s, qlos, qhis, weights, ns, valids = [], [], [], [], [], []
    for _ in range(n_candidates):
        best = jnp.argmax(score, axis=1)               # (B,)
        bi = best[:, None]
        lo_i = best
        hi_i = jnp.take_along_axis(hi_idx, bi, axis=1)[:, 0]
        wsum = jnp.take_along_axis(score, bi, axis=1)[:, 0]
        ok = wsum > 0.0
        nmem = (
            jnp.take_along_axis(cnt_csum0, hi_i[:, None], axis=1)
            - jnp.take_along_axis(cnt_csum0, lo_i[:, None], axis=1)
        )[:, 0]
        # member q extent + weighted-mean diagonal (masked, O(A) per cand).
        # The mean is computed on WINDOW-RELATIVE diagonals (<= win) so it
        # stays exact in float32 for genome-scale absolute diagonals — a
        # global-coordinate fp32 mean drifts by hundreds of bases at
        # hundreds of Mb and pushes the window off the band.
        member = (ar >= lo_i[:, None]) & (ar < hi_i[:, None]) & (ds < BIG)
        dstar_c = jnp.take_along_axis(ds, bi, axis=1)[:, 0]
        rel = jnp.where(
            member, ws * (ds - dstar_c[:, None]).astype(jnp.float32), 0.0
        ).sum(axis=1)
        d0 = jnp.where(
            ok,
            dstar_c + (rel / jnp.maximum(wsum, 1e-9)).astype(jnp.int32),
            0,
        )
        qlo = jnp.min(jnp.where(member, qs, BIG), axis=1)
        qhi = jnp.max(jnp.where(member, qs + k, -1), axis=1)
        d0s.append(d0)
        qlos.append(jnp.where(ok, qlo, 0))
        qhis.append(jnp.where(ok, qhi, 0))
        weights.append(jnp.where(ok, wsum, 0.0))
        ns.append(jnp.where(ok, nmem, 0))
        valids.append(ok)
        # suppress anchors within +-win of the chosen window start
        dstar = jnp.take_along_axis(ds, bi, axis=1)    # (B, 1)
        near = (ds >= dstar - win) & (ds < dstar + win)
        score = jnp.where(near, -1.0, score)

    stack = lambda xs: jnp.stack(xs, axis=1)
    return Candidates(
        d0=stack(d0s),
        q_lo=stack(qlos),
        q_hi=stack(qhis),
        weight=stack(weights),
        n_anchors=stack(ns),
        valid=stack(valids),
    )


def anchor_weights(
    nhits: jax.Array, valid: jax.Array, genome_len: int, win: int, pval_type: int
) -> jax.Array:
    """Per-anchor evidence weight — the candidate-weightor family.

    Role of the reference's -pvaltype weightor selection
    (Blasr.cpp:2342-2347,2388-2488; LISPValueWeightor / LISSumOfLogPWeightor /
    LISSizeWeightor in common/algorithms/anchoring/):

      0/1  -log2 of the expected number of random hits of this k-mer inside
           the candidate window (nhits * win / G) — rarer k-mers carry more
           evidence, the vectorized analogue of ComputeLISPValue over the
           TupleCountTable (the SA-interval width IS the genome-wide count)
      2    plain anchor count (LISSizeWeightor)
      3    inverse frequency 1/nhits (legacy v0 weighting)
    """
    nh = jnp.maximum(nhits, 1).astype(jnp.float32)
    if pval_type == 2:
        w = jnp.ones_like(nh)
    elif pval_type == 3:
        w = 1.0 / nh
    else:
        expect = nh * jnp.float32(win) / jnp.float32(max(genome_len, 1))
        w = jnp.maximum(-jnp.log2(expect), 0.5)
    return jnp.where(valid, w, 0.0)
