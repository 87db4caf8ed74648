"""Roofline / MFU analysis of the mapping pipeline on the real TPU.

Answers the round-4 VERDICT questions:
  (a) what does each pipeline stage achieve vs the device capability
      (cells/s for the DP wavefront, gathers/s for anchor+setup)?
  (b) is the narrow-band DP serial-step-bound or compute-bound — i.e.
      what happens to kernel time when items/step grow at fixed steps?
  (c) why does B=128 lose to B=64 at W=32 (bucket padding? DP scaling?
      per-batch overheads)?

Everything runs in ONE process (the axon attach tax is per process) and
times via an explicit tiny d2h transfer (block_until_ready is unreliable
through the tunnel, CLAUDE.md).

Run: python scripts/roofline.py            # full measurement
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t_ms(fn, pick, N=10):
    r = fn()
    np.asarray(pick(r))
    t0 = time.time()
    for _ in range(N):
        r = fn()
    np.asarray(pick(r))
    return (time.time() - t0) / N * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from blasr_tpu.ops.banded_align import AlignScores, make_qoff
    from blasr_tpu.ops.banded_pallas import banded_align_pallas

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # ---- 0. device gather rate (the anchor/setup currency) ----
    big = jnp.asarray(rng.integers(0, 2**30, 1 << 24).astype(np.int32))
    for NI in (1 << 18, 1 << 20):
        idx = jnp.asarray(rng.integers(0, 1 << 24, NI).astype(np.int32))
        g = jax.jit(lambda t, i: t[i])
        ms = t_ms(lambda: g(big, idx), lambda r: r[:1])
        print(f"[gather] {NI>>10}k random int32 from 64M-entry table: "
              f"{ms:.2f} ms = {NI/ms/1e3:.0f} M elem/s", flush=True)

    # ---- 1. DP kernel scaling: items at fixed steps (W=32 packed) ----
    L, TP = 1024, 256
    T = L + TP
    S = L + T - 1
    qoff = jnp.asarray(make_qoff(L, T, 32, TP // 2))

    def dp_case(I, W, tb=True):
        Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
        Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
        for i in range(I):
            c = Q[i].copy()
            mut = rng.random(L) < 0.12
            c[mut] = (c[mut] + 1) % 4
            Tc[i, TP // 2 : TP // 2 + L] = c
        Qd, Td = jnp.asarray(Q), jnp.asarray(Tc)
        qlen = jnp.full((I,), L, jnp.int32)
        tlo = jnp.zeros((I,), jnp.int32)
        thi = jnp.full((I,), T, jnp.int32)
        qo = jnp.asarray(make_qoff(L, T, W, TP // 2))

        def step():
            return banded_align_pallas(
                Qd, qlen, Td, tlo, thi, qo, None,
                scores=AlignScores(), with_traceback=tb, band_width=W,
            )

        ms = t_ms(step, lambda r: r.score[:1])
        cells = I * S * W
        # grid iterations: ceil(R/IT) * ceil(S/U); R=I/P rows
        P = 128 // W if W < 128 else 1
        from blasr_tpu.ops.banded_pallas import ITEM_TILE, UNROLL, _auto_unroll
        LW = W * P
        IT = min(max(32, ITEM_TILE * 128 // LW), max(1, -(-I // P)))
        R = -(-I // (IT * P)) * IT
        UU = UNROLL if UNROLL else _auto_unroll(R, IT)
        niter = (R // IT) * (-(-S // UU))
        print(f"[dp W={W} I={I}] {ms:.2f} ms  {cells/ms/1e6:.2f} Gcell/s  "
              f"grid {R//IT}x{-(-S//UNROLL)} -> {ms*1e3/niter:.2f} us/iter",
              flush=True)
        return ms

    for I in (128, 256, 512, 1024):
        dp_case(I, 32)
    dp_case(256, 64)
    dp_case(256, 128)

    # ---- 2. bucket padding at B=64 vs 128 (the B=128 anomaly input) ----
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
    )
    reads_fa = os.path.join(bench_dir, "reads.fasta")
    if os.path.exists(reads_fa):
        from blasr_tpu.io.batching import batch_reads, read_records

        reads = read_records(reads_fa)
        for B in (64, 128, 256):
            nb = 0
            filled = 0
            cost = 0
            for b in batch_reads(reads, B, 3328):
                nb += 1
                filled += int((b.indices >= 0).sum())
                cost += B * b.max_len
            print(f"[buckets B={B}] {nb} batches, fill "
                  f"{filled/(nb*B)*100:.0f}%, padded-cell cost {cost/1e6:.1f}M "
                  f"({cost/sum(len(r) for r in reads):.2f}x of read bases)",
                  flush=True)


if __name__ == "__main__":
    main()
