"""Isolate the setup-stage device costs at bench shapes (B=256, cap1024):
the genome window word gather, the anchor row gathers, the cross-strand
top-k, and the centring math — the profile lumps them into one +8 ms
marginal, this splits them.

Run: python scripts/micro_setup.py
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

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)

    B, CD, A, L = 256, 2, 128, 1024
    I = B * CD
    T = L + 256
    NW8 = T // 8 + 2
    GW = 4_600_000 // 8 + 200

    gp = jnp.asarray(rng.integers(0, 2**31 - 1, GW).astype(np.int32))
    t0f = jnp.asarray(rng.integers(0, 4_500_000, I).astype(np.int32))
    at = jnp.asarray(rng.integers(0, 4_600_000, (2 * B, A)).astype(np.int32))
    aq = jnp.asarray(rng.integers(0, L, (2 * B, A)).astype(np.int32))
    row = jnp.asarray(rng.integers(0, 2 * B, I).astype(np.int32))

    def t_ms(fn, pick, N=30):
        r = fn()
        np.asarray(pick(r))
        t0 = time.time()
        for _ in range(N):
            r = fn()
        np.asarray(pick(r))
        return (time.time() - t0) / N * 1e3

    @jax.jit
    def g_words(gp, t0f):
        widx = (t0f >> 3)[:, None] + jnp.arange(NW8, dtype=jnp.int32)[None, :]
        return gp[jnp.clip(widx, 0, gp.shape[0] - 1)]

    ms = t_ms(lambda: g_words(gp, t0f), lambda r: r[:1, :1])
    print(f"[genome word gather (I={I} x {NW8})] {ms:.2f} ms "
          f"({I*NW8/ms/1e3:.0f} M elem/s)", flush=True)

    @jax.jit
    def g_rows(at, aq, row):
        return at[row], aq[row]

    ms = t_ms(lambda: g_rows(at, aq, row), lambda r: r[0][:1, :1])
    print(f"[anchor row gathers 2x(I={I} x {A})] {ms:.2f} ms", flush=True)

    @jax.jit
    def g_slope(at, aq, row, t0f):
        atr = at[row].astype(jnp.float32)
        aqr = aq[row].astype(jnp.float32)
        din = atr - aqr - t0f[:, None].astype(jnp.float32)
        m = jnp.abs(din) <= 256
        mf = m.astype(jnp.float32)
        qf = aqr * mf
        df = din * mf
        n_a = mf.sum(1)
        sq = qf.sum(1)
        sd = df.sum(1)
        sqq = (qf * qf * mf).sum(1)
        sqd = (qf * df).sum(1)
        denom = n_a * sqq - sq * sq
        slope_i = jnp.where(denom > 1e3, (n_a * sqd - sq * sd) / jnp.maximum(denom, 1.0), jnp.nan)
        return jnp.nanmedian(slope_i)

    ms = t_ms(lambda: g_slope(at, aq, row, t0f), lambda r: r)
    print(f"[slope fit + nanmedian] {ms:.2f} ms", flush=True)

    key = jnp.asarray(rng.random((B, 8)).astype(np.float32))

    @jax.jit
    def g_topk(key):
        return jax.lax.top_k(key, CD)

    ms = t_ms(lambda: g_topk(key), lambda r: r[0][:1, :1])
    print(f"[cross-strand top_k (B x 2C)] {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
