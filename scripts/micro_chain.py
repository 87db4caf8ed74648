"""Decompose chain_stats' 6.9 ms (micro_anchors.py) into its pieces.

Run: python scripts/micro_chain.py [R]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    B, A, C, k, win = 512, 128, 4, 14, 128
    BIG = jnp.int32(2**30)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.integers(0, 4_600_000, (B, A)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 1024, (B, A)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, A)) < 0.7)
    dstar = jnp.asarray(rng.integers(0, 4_600_000, (B, C)).astype(np.int32))
    cvalid = jnp.asarray(rng.random((B, C)) < 0.9)

    print(f"backend={jax.default_backend()} B={B} A={A} C={C}", flush=True)

    def timed(name, fn, *args):
        def outer(*a):
            def body(carry, _):
                out = fn(carry & 1, *a)
                return carry + out.reshape(-1)[0].astype(jnp.int32), None
            return jax.lax.scan(body, jnp.int32(0), None, length=R)[0]

        run = jax.jit(outer)
        r = run(*args)
        np.asarray(r)
        t0 = time.time()
        r = run(*args)
        np.asarray(r)
        dt = (time.time() - t0) / R * 1e3
        print(f"  {name:<40} {dt:6.3f} ms/iter", flush=True)

    # (1) argsort + take_alongs
    def f_sort(salt, t, q, valid):
        order = jnp.argsort(
            jnp.where(valid, q + salt, BIG), axis=1, stable=True)
        q_s = jnp.take_along_axis(q, order, axis=1)
        t_s = jnp.take_along_axis(t, order, axis=1)
        v_s = jnp.take_along_axis(valid, order, axis=1)
        return q_s + t_s + v_s
    timed("argsort + 3 take_along", f_sort, t, q, valid)

    order = jnp.argsort(jnp.where(valid, q, BIG), axis=1, stable=True)
    q_s = jnp.take_along_axis(q, order, axis=1)
    t_s = jnp.take_along_axis(t, order, axis=1)
    v_s = jnp.take_along_axis(valid, order, axis=1)
    d_s = t_s - q_s

    # (2) pairwise boundary count b
    def f_b(salt, q_s, v_s):
        qj = jnp.where(v_s, q_s + salt, BIG)
        return jnp.sum(
            (qj[:, None, :] <= (qj - k)[:, :, None]) & v_s[:, None, :],
            axis=-1,
        ).astype(jnp.int32)
    timed("pairwise b (B,A,A sum)", f_b, q_s, v_s)

    # (3) pair_ok (gap window + diagonal equality)
    def f_pair(salt, q_s, d_s, v_s):
        gap = (q_s + salt)[:, :, None] - q_s[:, None, :]
        return jnp.any(
            (d_s[:, :, None] == d_s[:, None, :])
            & v_s[:, :, None] & v_s[:, None, :]
            & (gap >= 3) & (gap <= k - 1),
            axis=-1,
        )
    timed("pair_ok (B,A,A any)", f_pair, q_s, d_s, v_s)

    # (4) membership + cummin/prev_t chain count
    qj = jnp.where(v_s, q_s, BIG)
    b = jnp.sum(
        (qj[:, None, :] <= (qj - k)[:, :, None]) & v_s[:, None, :],
        axis=-1,
    ).astype(jnp.int32)

    def f_scan(salt, d_s, t_s, v_s, dstar, cvalid, b):
        reld = d_s[:, None, :] - (dstar + salt)[:, :, None]
        mem = v_s[:, None, :] & (reld >= 0) & (reld < win) & cvalid[:, :, None]
        tmask = jnp.where(mem, t_s[:, None, :], BIG)
        cummin_t = jax.lax.associative_scan(jnp.minimum, tmask, axis=-1)
        bj = jnp.broadcast_to(b[:, None, :], mem.shape)
        prev_t = jnp.take_along_axis(
            cummin_t, jnp.maximum(bj - 1, 0), axis=-1)
        has_prev = (bj > 0) & (prev_t <= t_s[:, None, :] - k)
        return jnp.sum(mem & has_prev, axis=-1).astype(jnp.int32)
    timed("mem + cummin + take (B,C,A)", f_scan,
          d_s, t_s, v_s, dstar, cvalid, b)

    # (5) the take_along_axis on (B, C, A) alone
    reld = d_s[:, None, :] - dstar[:, :, None]
    mem = v_s[:, None, :] & (reld >= 0) & (reld < win) & cvalid[:, :, None]
    tmask = jnp.where(mem, t_s[:, None, :], BIG)
    cummin_t = jax.lax.associative_scan(jnp.minimum, tmask, axis=-1)
    bj3 = jnp.broadcast_to(b[:, None, :], mem.shape)

    def f_take(salt, cummin_t, bj3):
        return jnp.take_along_axis(
            cummin_t, jnp.maximum(bj3 - 1 + salt, 0), axis=-1)
    timed("take_along (B,C,A) minor-dim", f_take, cummin_t, bj3)

    # (6) full chain_stats for reference
    from blasr_tpu.ops.candidates import chain_stats

    def f_full(salt, t, q, valid, dstar, cvalid):
        n_chain, ch_any, cmass, corners = chain_stats(
            t + salt, q, valid, dstar, cvalid, k=k, win=win)
        return n_chain
    timed("full chain_stats", f_full, t, q, valid, dstar, cvalid)


if __name__ == "__main__":
    main()
