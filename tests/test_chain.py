"""chain_stats: colinear-chain evidence per candidate window.

Oracle: brute-force over member anchors — the exact pair test for the
maxPValue admission gate (a >=2-anchor colinear non-overlapping chain
exists), and the exact predecessor-link count for the rank statistic.
"""

import numpy as np
import pytest


def brute_chain(t, q, valid, dstar, win, k):
    """Per window: (n_chain, chained_any) exactly as chain_stats defines
    them — n_chain = 1[any member] + #{j : exists member i with
    q_i <= q_j - k and t_i <= t_j - k}, chained_any = that set nonempty."""
    mem = [
        i for i in range(len(q))
        if valid[i] and 0 <= (t[i] - q[i]) - dstar < win
    ]
    n_link = 0
    for j in mem:
        if any(q[i] <= q[j] - k and t[i] <= t[j] - k for i in mem):
            n_link += 1
    return n_link + (1 if mem else 0), n_link > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chain_stats_matches_bruteforce(seed):
    import jax.numpy as jnp

    from blasr_tpu.ops.candidates import chain_stats

    rng = np.random.default_rng(seed)
    B, A, C, k, win = 5, 40, 3, 14, 128
    G = 10_000
    q = rng.integers(0, 900, (B, A)).astype(np.int32)
    # half the anchors near a coherent diagonal per row, half scattered
    diag = rng.integers(0, G - 1000, (B, 1)).astype(np.int32)
    t = np.where(
        np.arange(A)[None, :] % 2 == 0,
        q + diag + rng.integers(0, win // 2, (B, A)),
        rng.integers(0, G, (B, A)),
    ).astype(np.int32)
    valid = rng.random((B, A)) > 0.2
    dstar = np.stack(
        [diag[:, 0], diag[:, 0] - 5, rng.integers(0, G, B)], axis=1
    ).astype(np.int32)
    cvalid = np.ones((B, C), bool)

    n_chain, chained_any = chain_stats(
        jnp.asarray(t), jnp.asarray(q), jnp.asarray(valid),
        jnp.asarray(dstar), jnp.asarray(cvalid), k=k, win=win,
    )
    n_chain = np.asarray(n_chain)
    chained_any = np.asarray(chained_any)
    for b in range(B):
        for c in range(C):
            exp_n, exp_any = brute_chain(
                t[b], q[b], valid[b], int(dstar[b, c]), win, k
            )
            assert n_chain[b, c] == exp_n, (b, c)
            assert chained_any[b, c] == exp_any, (b, c)


def test_chain_gate_rejects_scattered_window():
    """A window holding two anchors that cannot chain (t order opposes q
    order) must fail the admission gate; a true two-anchor chain passes."""
    import jax.numpy as jnp

    from blasr_tpu.ops.candidates import chain_stats

    k, win = 14, 128
    # row 0: q 0 -> t 100, q 50 -> t 60 (t regresses): no chain
    # row 1: q 0 -> t 100, q 50 -> t 150: chains
    t = jnp.asarray([[100, 60], [100, 150]], jnp.int32)
    q = jnp.asarray([[0, 50], [0, 50]], jnp.int32)
    valid = jnp.ones((2, 2), bool)
    dstar = jnp.asarray([[40], [80]], jnp.int32)
    cvalid = jnp.ones((2, 1), bool)
    n_chain, chained_any = chain_stats(
        t, q, valid, dstar, cvalid, k=k, win=win
    )
    assert not bool(chained_any[0, 0])
    assert bool(chained_any[1, 0])
    assert int(n_chain[1, 0]) == 2


def test_invalid_candidate_has_no_chain():
    import jax.numpy as jnp

    from blasr_tpu.ops.candidates import chain_stats

    t = jnp.asarray([[100, 150]], jnp.int32)
    q = jnp.asarray([[0, 50]], jnp.int32)
    valid = jnp.ones((1, 2), bool)
    dstar = jnp.asarray([[90]], jnp.int32)
    cvalid = jnp.zeros((1, 1), bool)
    n_chain, chained_any = chain_stats(
        t, q, valid, dstar, cvalid, k=14, win=128
    )
    assert int(n_chain[0, 0]) == 0
    assert not bool(chained_any[0, 0])
