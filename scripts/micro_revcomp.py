"""Microbench: per-row reverse-complement + row-gather forms on TPU.

rc (left-aligned) current form is a (B, L) take_along_axis (per-element
gather). Candidate: elementwise complement + static flip, then re-align each
row left by a per-row shift s = L - len done as word-phase arithmetic:
device nibble-pack 8 codes/int32 (ALU), per-row WORD take_along_axis
(L/8 elements), nibble unpack, 8-way phase select.

row gather current form reads2[row] (I, L) uint8. Candidate: bitcast rows
to int32 words, gather (I, L/4), bitcast back.

Run: python scripts/micro_revcomp.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, pick, N=100):
    r = fn()
    np.asarray(pick(r))
    t0 = time.time()
    for _ in range(N):
        r = fn()
    np.asarray(pick(r))
    print(f"  {name}: {(time.time()-t0)/N*1e3:.2f} ms")


def main():
    import jax
    import jax.numpy as jnp

    B, L = 64, 1024
    I = 128
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    lengths = jnp.asarray(rng.integers(L // 2, L + 1, B, dtype=np.int32))
    reads2 = jnp.asarray(rng.integers(0, 4, (2 * B, L), dtype=np.uint8))
    row = jnp.asarray(rng.integers(0, 2 * B, I, dtype=np.int32))
    np.asarray(codes[:1, :1])
    print(f"backend={jax.default_backend()} B={B} L={L}")

    @jax.jit
    def rc_cur(codes, lengths):
        idx = lengths[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
        ok = idx >= 0
        g = jnp.take_along_axis(codes, jnp.clip(idx, 0, L - 1), axis=1)
        comp = jnp.where(g < 4, 3 - g, g)
        return jnp.where(ok, comp, jnp.uint8(4)).astype(jnp.uint8)

    NW = L // 8 + 1

    @jax.jit
    def rc_word(codes, lengths):
        comp = jnp.where(codes < 4, 3 - codes, codes).astype(jnp.int32)
        flip = comp[:, ::-1]                              # (B, L)
        w = (flip.reshape(B, L // 8, 8) << (jnp.arange(8, dtype=jnp.int32) * 4)).sum(
            axis=2
        )                                                 # (B, L/8)
        s = (L - lengths).astype(jnp.int32)
        widx = (s >> 3)[:, None] + jnp.arange(NW, dtype=jnp.int32)[None, :]
        wv = jnp.take_along_axis(
            jnp.pad(w, ((0, 0), (0, 1))), jnp.clip(widx, 0, L // 8), axis=1
        )                                                 # (B, NW)
        nsh = jnp.arange(8, dtype=jnp.int32) * 4
        b = ((wv[:, :, None] >> nsh[None, None, :]) & 15).astype(jnp.uint8)
        b = b.reshape(B, NW * 8)
        r = s & 7
        out = b[:, 0:L]
        for ph in range(1, 8):
            out = jnp.where((r == ph)[:, None], b[:, ph : ph + L], out)
        ar = jnp.arange(L, dtype=jnp.int32)[None, :]
        return jnp.where(ar < lengths[:, None], out, jnp.uint8(4))

    @jax.jit
    def rows_cur(reads2, row):
        return reads2[row]

    @jax.jit
    def rows_word(reads2, row):
        w = jax.lax.bitcast_convert_type(
            reads2.reshape(2 * B, L // 4, 4), jnp.int32
        )                                                 # (2B, L/4)
        g = w[row]                                        # (I, L/4)
        return jax.lax.bitcast_convert_type(g, jnp.uint8).reshape(I, L)

    a = np.asarray(rc_cur(codes, lengths))
    b = np.asarray(rc_word(codes, lengths))
    assert (a == b).all(), "rc mismatch"
    c = np.asarray(rows_cur(reads2, row))
    d = np.asarray(rows_word(reads2, row))
    assert (c == d).all(), "rows mismatch"

    bench("rc  cur  take_along ", lambda: rc_cur(codes, lengths), lambda r: r[:1, :1])
    bench("rc  word flip+shift ", lambda: rc_word(codes, lengths), lambda r: r[:1, :1])
    bench("rows cur  elem      ", lambda: rows_cur(reads2, row), lambda r: r[:1, :1])
    bench("rows word bitcast   ", lambda: rows_word(reads2, row), lambda r: r[:1, :1])


if __name__ == "__main__":
    main()
