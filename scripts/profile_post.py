"""Profile the post-walk pipeline pieces on the real TPU.

Shapes at the bench operating point: B=64, CD=2 -> I=128, cap=1024,
T=1280, best_n=1 -> I2=64, SD=L+T-1.

Pieces measured independently with synthetic inputs of the right shape:
  1. tcodes byte gather  genome_pad[gidx]           (I, T) from ~9 MB
  2. tcodes word gather  int32 view + byte realign  (I, T/4+1)
  3. slope-fit block     (I, A) anchor regression + median
  4. mapqv               map_qv_reference (B, CD)
  5. pack_moves_rows     (I2, SD) argsort+scatter+cumsum
  6. sel stack + bitcast wire concat

Run: python scripts/profile_post.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, CD, L, TP = 64, 2, 1024, 256
    I = B * CD
    T = L + TP
    A = 512
    G = 4_600_000
    pad = 3072 + 1024

    rng = np.random.default_rng(0)
    genome_pad = jnp.asarray(
        rng.integers(0, 4, (G + 2 * pad,)).astype(np.uint8)
    )
    t0f = jnp.asarray(rng.integers(0, G - T, (I,)).astype(np.int32))
    np.asarray(genome_pad[:1])
    print(f"backend={jax.default_backend()} I={I} T={T}")

    def bench_one(name, fn, pick, N=100):
        r = fn()
        np.asarray(pick(r))
        t0 = time.time()
        for _ in range(N):
            r = fn()
        np.asarray(pick(r))
        print(f"  {name}: {(time.time()-t0)/N*1e3:.2f} ms")

    @jax.jit
    def null(x):
        return x[:5] * 2

    bench_one("0. null (bias)     ", lambda: null(t0f), lambda r: r[:1])

    @jax.jit
    def tcodes_byte(genome_pad, t0f):
        gidx = t0f[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :] + pad
        return genome_pad[gidx]

    bench_one("1. tcodes byte gthr", lambda: tcodes_byte(genome_pad, t0f), lambda r: r[:1, :1])

    # word-gather variant: int32 view, per-row byte realign with shifts
    Gp = genome_pad.shape[0]
    genome32 = jax.lax.bitcast_convert_type(
        genome_pad[: Gp // 4 * 4].reshape(-1, 4), jnp.uint32
    )
    TW = T // 4 + 1

    @jax.jit
    def tcodes_word(genome32, t0f):
        base = t0f + pad
        a = base >> 2
        r = (base & 3).astype(jnp.uint32)[:, None]
        w = genome32[a[:, None] + jnp.arange(TW, dtype=jnp.int32)[None, :]]
        nxt = jnp.concatenate([w[:, 1:], w[:, :1]], axis=1)
        sh = 8 * r
        comb = jnp.where(
            sh == 0, w, (w >> sh) | (nxt << (32 - jnp.minimum(sh, 31)))
        )
        by = jax.lax.bitcast_convert_type(comb[:, : T // 4], jnp.uint8)
        return by.reshape(I, T)

    bench_one("2. tcodes word gthr", lambda: tcodes_word(genome32, t0f), lambda r: r[:1, :1])

    # equality check
    a = np.asarray(tcodes_byte(genome_pad, t0f))
    b = np.asarray(tcodes_word(genome32, t0f))
    assert (a == b).all(), "word-gather mismatch"
    print("     (word == byte: OK)")

    # 3. slope-fit block
    at = jnp.asarray(rng.integers(0, G, (I, A)).astype(np.int32))
    aq = jnp.asarray(rng.integers(0, L, (I, A)).astype(np.int32))
    av = jnp.asarray(rng.random((I, A)) < 0.9)
    d0 = jnp.asarray(rng.integers(0, G - T, (I,)).astype(np.int32))
    cvalid = jnp.ones((I,), bool)

    @jax.jit
    def slope_fit(at, aq, av, d0):
        CW = 128
        din = at - aq - d0[:, None]
        m = av & (jnp.abs(din) <= CW)
        mf = m.astype(jnp.float32)
        qf = aq.astype(jnp.float32) * mf
        df = din.astype(jnp.float32) * mf
        n_a = mf.sum(1)
        sq = qf.sum(1)
        sd = df.sum(1)
        sqq = (qf * qf * jnp.where(m, 1.0, 0.0)).sum(1)
        sqd = (qf * df).sum(1)
        denom = n_a * sqq - sq * sq
        ok = (n_a >= 3) & (denom > 1e3)
        slope_i = jnp.where(ok, (n_a * sqd - sq * sd) / jnp.maximum(denom, 1.0), jnp.nan)
        return jnp.nan_to_num(jnp.nanmedian(jnp.where(cvalid, slope_i, jnp.nan)), nan=0.0)

    bench_one("3. slope fit       ", lambda: slope_fit(at, aq, av, d0), lambda r: r)

    # 4. mapqv
    from blasr_tpu.ops.mapqv import map_qv_reference

    sc = jnp.asarray(-rng.integers(100, 900, (B, CD)).astype(np.int32))
    sv = jnp.ones((B, CD), bool)
    wq_lo = jnp.zeros((B, CD), jnp.int32)
    wq_hi = jnp.full((B, CD), L, jnp.int32)
    nm = jnp.full((B, CD), 900, jnp.int32)
    nx = jnp.full((B, CD), 30, jnp.int32)
    ni = jnp.full((B, CD), 50, jnp.int32)
    nd = jnp.full((B, CD), 44, jnp.int32)

    @jax.jit
    def mq(sc, sv, wq_lo, wq_hi, nm, nx, ni, nd):
        return map_qv_reference(sc, sv, wq_lo, wq_hi, nm, nx, ni, nd,
                                ins_cost=-5, del_cost=-5)

    bench_one("4. mapqv           ", lambda: mq(sc, sv, wq_lo, wq_hi, nm, nx, ni, nd), lambda r: r[:1, :1])

    # 5. pack_moves_rows
    from blasr_tpu.ops.traceback_device import pack_moves_rows, packed_width

    I2 = B * 1
    SD = L + T - 1
    md = rng.integers(0, 1 << 10, (I2, SD)).astype(np.int32)
    md[:, ::3] = 0
    md_j = jnp.asarray(md)
    OW = packed_width(L + T - 1)

    @jax.jit
    def pm(md_j):
        return pack_moves_rows(md_j, OW)

    bench_one("5. pack_moves_rows ", lambda: pm(md_j), lambda r: r[:1, :1])

    # 6. containment/selection block shape cost (argsorts over CD=2 are tiny)
    @jax.jit
    def wire(sel_ints, moves, read_ints):
        sel8 = jax.lax.bitcast_convert_type(sel_ints, jnp.uint8).reshape(-1)
        rd8 = jax.lax.bitcast_convert_type(read_ints, jnp.uint8).reshape(-1)
        return jnp.concatenate([sel8, moves.reshape(-1), rd8])

    sel_ints = jnp.zeros((14, I2), jnp.int32)
    moves = jnp.zeros((I2, OW), jnp.uint8)
    read_ints = jnp.zeros((B, 2 * CD), jnp.int32)
    bench_one("6. wire concat     ", lambda: wire(sel_ints, moves, read_ints), lambda r: r[:1])


if __name__ == "__main__":
    main()
