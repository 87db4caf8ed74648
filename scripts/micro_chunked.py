"""Micro-bench the CHUNKED guided narrow-band kernel vs the packed
(unguided) kernel on the real TPU, across UNROLL values.

The chunked mode pays per-chunk window rolls every grid iteration; larger
U amortizes the extraction over more substeps (unlike the unguided kernel
where U=2 is measured optimal). Each variant runs in-process (UNROLL is a
per-call parameter now via env BLASR_DP_UNROLL=0 auto; we pass explicit
values by monkeypatching _auto_unroll).

Run: python scripts/micro_chunked.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from blasr_tpu.ops import banded_pallas as bp
    from blasr_tpu.ops.banded_align import (
        QOFF_NUM_HALF, clamp_knots_to_shared, make_qoff, make_qoff_knots,
    )

    rng = np.random.default_rng(3)
    I, L, TP = 128, 1024, 256
    T = L + TP
    S = L + T - 1

    def build(W):
        Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
        Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
        for i in range(I):
            c = Q[i].copy()
            mut = rng.random(L) < 0.12
            c[mut] = (c[mut] + 1) % 4
            Tc[i, TP // 2 : TP // 2 + L] = c
        qoff = make_qoff(L, T, W, TP // 2)
        # straight-line knots (deviation 0) — extraction cost is what we
        # measure, independent of knot shape
        A = 16
        aq = np.linspace(10, L - 20, A).astype(np.int32)[None, :].repeat(I, 0)
        at = (aq + TP // 2).astype(np.int32)
        knots = make_qoff_knots(
            jnp.asarray(aq + at), jnp.asarray(aq - W // 2),
            jnp.ones_like(aq, bool), S, L, W, diag=TP // 2,
            num=QOFF_NUM_HALF,
        )
        _, mL = bp._guided_geometry(True, 128 // W, W)
        knots = clamp_knots_to_shared(
            knots, jnp.asarray(qoff), W, max_dev=mL * W - 8
        )
        return (
            jnp.asarray(Q), jnp.full((I,), L, jnp.int32), jnp.asarray(Tc),
            jnp.zeros((I,), jnp.int32), jnp.full((I,), T, jnp.int32),
            jnp.asarray(qoff), knots,
        )

    def t_ms(fn, N=10):
        r = fn()
        np.asarray(r.score[:1])
        t0 = time.time()
        for _ in range(N):
            r = fn()
        np.asarray(r.score[:1])
        return (time.time() - t0) / N * 1e3

    for W in (32, 64):
        Qd, ql, Td, tl, th, qo, kn = build(W)
        for U in (2, 4, 8):
            ms_g = t_ms(lambda: bp.banded_align_pallas(
                Qd, ql, Td, tl, th, qo, None,
                with_traceback=True, band_width=W, qoff_knots=kn,
                unroll=U,
            ))
            ms_p = t_ms(lambda: bp.banded_align_pallas(
                Qd, ql, Td, tl, th, qo, None,
                with_traceback=True, band_width=W, unroll=U,
            ))
            print(f"[W={W} U={U}] chunked-guided {ms_g:6.2f} ms | "
                  f"packed-unguided {ms_p:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
