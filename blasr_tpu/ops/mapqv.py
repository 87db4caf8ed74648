"""Mapping-quality computation (L5).

Role of reference ``StoreMapQVs`` (Blasr.cpp:2761-2950): candidates compete
in probability space; mapQV is the Phred-scaled probability that the best
candidate is the true location:

    p_i ∝ 10^(-score_i / 10)
    mapqv = -10 * log10(1 - p_best / sum_i p_i),  capped at 254

(The reference rescores with SMRTLogProbMatrix giving probScore = -score/10;
using the alignment score directly keeps the same ordering.)
A single competing candidate yields 254, as in the reference (:2875-2945).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG10 = 2.302585092994046


def map_qv(scores: jax.Array, valid: jax.Array, best_score: jax.Array) -> jax.Array:
    """scores (B, M) int32 (minimization), valid (B, M), best (B,) int32.

    Returns (B,) int32 mapQV in [0, 254].
    """
    ps = -scores.astype(jnp.float32) / 10.0            # log10 prob units
    ps = jnp.where(valid, ps, -jnp.inf)
    ps_best = -best_score.astype(jnp.float32) / 10.0
    # log10(sum 10^ps) via natural-log logsumexp
    lse = jax.nn.logsumexp(ps * LOG10, axis=1) / LOG10
    delta = ps_best - lse                               # <= 0
    one_minus = -jnp.expm1(delta * LOG10)               # 1 - 10^delta
    one_minus = jnp.maximum(one_minus, 1e-26)
    q = -10.0 * jnp.log10(one_minus)
    nvalid = jnp.sum(valid, axis=1)
    q = jnp.where(nvalid <= 1, 254.0, q)
    return jnp.clip(q, 0, 254).astype(jnp.int32)
