"""Mapping-quality computation (L5).

Role of reference ``StoreMapQVs`` (Blasr.cpp:2761-2950), implemented
decision-for-decision, vectorized over the batch with the per-candidate
loops unrolled statically (CD <= ~16):

  1. rescore every candidate with SMRTLogProbMatrix (ScoreMatrices.h:28-34:
     match 0 / mismatch 15) + linear indel costs, probScore = -score/10
     (log10 probability units), Blasr.cpp:2780-2785
  2. greedy-partition candidates that overlap >= 75 pct on the FORWARD read
     (PartitionOverlappingAlignments, Blasr.cpp:2726 + AlignmentsOverlap:
     containment always overlaps; else max(ovp/lenA, ovp/lenB) > minFrac)
  3. per partition pick the widest member interval subject to a running
     nMatch*1.2 >= partitionScore gate (Blasr.cpp:2804-2828)
  4. members whose interval sits > MAPQV_END_ALIGN_WIGGLE (5) inside the
     partition interval pay -0.5 * 15 * (uncovered flank bases) in probScore
     (SumMismatches without substitutionQV, Blasr.cpp:2850-2870)
  5. denominator = running log10-sum over members whose nMatch*1.2 clears
     the running max nMatch (first member always included), Blasr.cpp:2875-2897
  6. mapQV = Phred(1 - 10^(prob - denom)) capped to 254; single-member
     partitions get 254; prob - denom < -20 floors to 0 (Blasr.cpp:2900-2945)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LOG10 = 2.302585092994046
MAX_PHRED = 254
WIGGLE = 5          # MAPQV_END_ALIGN_WIGGLE, Blasr.cpp:80
MIN_OVERLAP = 0.75  # minFractionToBeConsideredOverlapping default


def map_qv(scores: jax.Array, valid: jax.Array, best_score: jax.Array) -> jax.Array:
    """Legacy winner-vs-competitors logsumexp (kept for the cross-shard
    merge, parallel/sharded.py). scores (B, M) int32, valid (B, M)."""
    ps = -scores.astype(jnp.float32) / 10.0            # log10 prob units
    ps = jnp.where(valid, ps, -jnp.inf)
    ps_best = -best_score.astype(jnp.float32) / 10.0
    lse = jax.nn.logsumexp(ps * LOG10, axis=1) / LOG10
    delta = ps_best - lse
    one_minus = -jnp.expm1(delta * LOG10)
    one_minus = jnp.maximum(one_minus, 1e-26)
    q = -10.0 * jnp.log10(one_minus)
    nvalid = jnp.sum(valid, axis=1)
    q = jnp.where(nvalid <= 1, 254.0, q)
    return jnp.clip(q, 0, 254).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mismatch_prob", "ins_cost", "del_cost"))
def map_qv_reference(
    scores: jax.Array,      # (B, CD) int32 DP scores (minimization)
    valid: jax.Array,       # (B, CD) bool
    q_lo: jax.Array,        # (B, CD) int32 forward-read aligned start
    q_hi: jax.Array,        # (B, CD) int32 forward-read aligned end
    n_match: jax.Array,     # (B, CD) int32
    n_mismatch: jax.Array,  # (B, CD) int32
    n_ins: jax.Array,       # (B, CD) int32
    n_del: jax.Array,       # (B, CD) int32
    *,
    mismatch_prob: int = 15,  # SMRTLogProbMatrix off-diagonal
    ins_cost: int = 5,
    del_cost: int = 5,
) -> jax.Array:
    """Per-candidate mapQV (B, CD) int32 following StoreMapQVs exactly."""
    B, CD = scores.shape
    NEG = jnp.float32(-1e30)

    # ---- 1. SMRTLogProbMatrix rescore (log10 prob units) ----
    prob = -(
        mismatch_prob * n_mismatch + ins_cost * n_ins + del_cost * n_del
    ).astype(jnp.float32) / 10.0

    # process in score order, best (lowest) first, like the sorted
    # alignmentPtrs vector at the StoreMapQVs call site (Blasr.cpp:2547)
    order = jnp.argsort(jnp.where(valid, scores, jnp.int32(2**30)), axis=1)
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    v = take(valid)
    lo = take(q_lo).astype(jnp.int32)
    hi = take(q_hi).astype(jnp.int32)
    nm = take(n_match).astype(jnp.float32)
    pr = take(prob)

    # ---- 2. greedy partition over overlap on the read ----
    def overlaps(i, j):
        ai, bi = lo[:, i], hi[:, i]
        aj, bj = lo[:, j], hi[:, j]
        contain = ((ai <= aj) & (bi >= bj)) | ((aj <= ai) & (bj >= bi))
        ovp = jnp.maximum(jnp.minimum(bi, bj) - jnp.maximum(ai, aj), 0)
        li = jnp.maximum(bi - ai, 1).astype(jnp.float32)
        lj = jnp.maximum(bj - aj, 1).astype(jnp.float32)
        frac = jnp.maximum(ovp / li, ovp / lj)
        return contain | (frac > MIN_OVERLAP)

    pid_cols = [jnp.zeros(B, jnp.int32)]
    for i in range(1, CD):
        best_pid = jnp.full(B, i, jnp.int32)
        for j in range(i - 1, -1, -1):
            ov = overlaps(i, j) & v[:, j] & v[:, i]
            best_pid = jnp.where(ov, jnp.minimum(best_pid, pid_cols[j]), best_pid)
        pid_cols.append(best_pid)
    pid = jnp.stack(pid_cols, axis=1)                       # (B, CD)
    pid = jnp.where(v, pid, jnp.int32(-1))

    # ---- 3. partition interval: sequential widest-member selection ----
    # per partition p (founder index), run the reference's running update:
    # iterate members in order, replace interval when wider AND
    # nMatch*1.2 >= current partition score
    pbeg_p = []
    pend_p = []
    for p in range(CD):
        member = (pid == p) & v                             # (B, CD)
        cur_b = jnp.zeros(B, jnp.int32)
        cur_e = jnp.zeros(B, jnp.int32)
        cur_s = jnp.zeros(B, jnp.float32)
        started = jnp.zeros(B, bool)
        for m in range(CD):
            is_m = member[:, m]
            wider = (hi[:, m] - lo[:, m]) > (cur_e - cur_b)
            gate = nm[:, m] * 1.2 >= cur_s
            repl = is_m & (~started | (wider & gate))
            cur_b = jnp.where(repl, lo[:, m], cur_b)
            cur_e = jnp.where(repl, hi[:, m], cur_e)
            cur_s = jnp.where(repl, nm[:, m], cur_s)
            started = started | is_m
        pbeg_p.append(cur_b)
        pend_p.append(cur_e)
    pbeg = jnp.stack(pbeg_p, axis=1)                        # (B, CD) per pid
    pend = jnp.stack(pend_p, axis=1)

    pidc = jnp.clip(pid, 0, CD - 1)
    my_beg = jnp.take_along_axis(pbeg, pidc, axis=1)
    my_end = jnp.take_along_axis(pend, pidc, axis=1)

    # ---- 4. end-extension penalty ----
    flank = (lo - my_beg) + (my_end - hi)
    wiggle = ((lo - my_beg) > WIGGLE) | ((my_end - hi) > WIGGLE)
    pr = pr + jnp.where(wiggle & v, -0.5 * 15.0 * jnp.maximum(flank, 0), 0.0)

    # ---- 5. running log10-sum denominator with the nMatch*1.2 gate ----
    denom_p = []
    size_p = []
    for p in range(CD):
        member = (pid == p) & v
        denom = jnp.full(B, NEG)
        maxnm = jnp.zeros(B, jnp.float32)
        started = jnp.zeros(B, bool)
        for m in range(CD):
            is_m = member[:, m]
            first = is_m & ~started
            maxnm = jnp.where(is_m, jnp.maximum(maxnm, nm[:, m]), maxnm)
            gate = nm[:, m] * 1.2 >= maxnm
            add = first | (is_m & gate)
            # log10(10^denom + 10^pr_m)
            mx = jnp.maximum(denom, pr[:, m])
            mn = jnp.minimum(denom, pr[:, m])
            summed = mx + jnp.log1p(jnp.exp((mn - mx) * LOG10)) / LOG10
            denom = jnp.where(add, jnp.where(first, pr[:, m], summed), denom)
            started = started | is_m
        denom_p.append(denom)
        size_p.append(jnp.sum(member, axis=1))
    denom = jnp.take_along_axis(jnp.stack(denom_p, axis=1), pidc, axis=1)
    psize = jnp.take_along_axis(jnp.stack(size_p, axis=1), pidc, axis=1)

    # ---- 6. phred ----
    sub = pr - denom
    expo = jnp.power(10.0, sub)
    one_minus = 1.0 - expo
    q = jnp.where(
        one_minus <= 0.0,
        jnp.float32(MAX_PHRED),
        -10.0 * jnp.log10(jnp.maximum(one_minus, 1e-30)),
    )
    q = jnp.where(sub < -20.0, 0.0, q)
    q = jnp.where(psize <= 1, jnp.float32(MAX_PHRED), q)
    q = jnp.clip(q, 0, MAX_PHRED).astype(jnp.int32)

    # un-permute back to the caller's candidate order
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(q, inv, axis=1)
