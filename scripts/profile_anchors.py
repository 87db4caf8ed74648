"""Sub-profile the anchor phase internals on the real TPU.

Times, at the bench operating point (B=64 -> 2B=128 items, cap=1024,
stride=2 -> L=512 positions, direct-LUT k=14 index):
  a. pack_query_kmers + revcomp only
  b. + ctab/ctab_valid gathers (the per-position count lookups)
  c. + position top_k (the priority compaction)
  d. full find_anchors (adds slot assignment + sa_valid gather)

Run: python scripts/profile_anchors.py [stride]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import jax
    import jax.numpy as jnp

    from blasr_tpu.index.artifacts import load_index
    from blasr_tpu.io.batching import batch_reads, read_records
    from blasr_tpu.params import MappingParams
    from blasr_tpu.pipeline import mapper as M
    from blasr_tpu.pipeline.mapper import Mapper

    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
    )
    index = load_index(os.path.join(bench_dir, "genome.fasta"), k=14)
    reads = read_records(os.path.join(bench_dir, "reads.fasta"))
    params = MappingParams(
        batch_size=64, max_read_len=3072, n_candidates=4,
        n_dp_candidates=2, anchor_stride=stride, best_n=1,
    )
    mapper = Mapper(index, params)
    di = mapper.device_index
    assert di.lut_meta is not None and di.lut_meta[1] == 0, "need direct-LUT"
    sa_valid, ctab16, lut, lut_valid = di.arrays
    k = di.k
    KH = params.max_anchors_per_position
    A = params.max_anchors_per_read

    batches = [
        b for b in batch_reads(reads, params.batch_size, params.max_read_len)
        if b.max_len == 1024
    ]
    codes = jnp.asarray(batches[0].codes)
    lengths = jnp.asarray(batches[0].lengths)
    np.asarray(codes[:1, :1])
    print(f"backend={jax.default_backend()} stride={stride} A={A} KH={KH} k={k}")

    from blasr_tpu.ops.anchors import pack_query_kmers

    def prep(codes, lengths):
        rc = M._revcomp_rows(codes, lengths)
        reads2 = jnp.concatenate([codes, rc], axis=0)
        lens2 = jnp.concatenate([lengths, lengths], axis=0)
        qk = pack_query_kmers(reads2, lens2, k)
        if stride > 1:
            qk = qk[:, ::stride]
        return qk

    @jax.jit
    def stage_a(codes, lengths):
        return prep(codes, lengths)

    def counts(qk, ctab16):
        cv = ctab16[jnp.clip(qk, 0, ctab16.shape[0] - 1)].astype(jnp.int32)
        cv = jnp.where(qk >= 0, cv, 0)
        return cv >> 8, cv & 255

    @jax.jit
    def stage_b(codes, lengths, ctab16):
        qk = prep(codes, lengths)
        return counts(qk, ctab16)

    @jax.jit
    def stage_c(codes, lengths, ctab16):
        qk = prep(codes, lengths)
        nh, nh_v = counts(qk, ctab16)
        B2, L = qk.shape
        pos_has = (qk >= 0) & (nh > 0) & (nh <= KH) & (nh_v > 0)
        st = max(1, (2 * L * KH) // max(A, 1) // 2)
        base = jnp.int32(1 << 20)
        pos_ar = jnp.arange(L, dtype=jnp.int32)
        pos_prio = base - nh * 16 + jnp.where((pos_ar % st) == 0, base // 2, 0)
        pos_prio = jnp.where(pos_has, pos_prio, jnp.int32(-1))
        P = min(A, L)
        return jax.lax.top_k(pos_prio, P)

    def tail(codes, lengths, ctab16, lut_valid, upto):
        qk = prep(codes, lengths)
        nh, nh_v = counts(qk, ctab16)
        B2, L = qk.shape
        pos_has = (qk >= 0) & (nh > 0) & (nh <= KH) & (nh_v > 0)
        st = max(1, (2 * L * KH) // max(A, 1) // 2)
        base = jnp.int32(1 << 20)
        pos_ar = jnp.arange(L, dtype=jnp.int32)
        pos_prio = base - nh * 16 + jnp.where((pos_ar % st) == 0, base // 2, 0)
        pos_prio = jnp.where(pos_has, pos_prio, jnp.int32(-1))
        P = min(A, L)
        pvals, psel = jax.lax.top_k(pos_prio, P)
        klo_sel = jnp.take_along_axis(qk, psel, axis=1)
        NK = lut_valid.shape[0]
        lov = lut_valid[jnp.clip(klo_sel, 0, NK - 2)]
        cntv = jnp.take_along_axis(nh_v, psel, axis=1)
        cnt = jnp.where(pvals > 0, cntv, 0)
        csum = jnp.cumsum(cnt, axis=1)
        if upto == "lov":
            return lov, csum
        starts = csum - cnt
        rows = jnp.arange(B2, dtype=jnp.int32)[:, None]
        mark = jnp.zeros((B2, A + 1), jnp.int32).at[
            rows, jnp.clip(starts, 0, A)
        ].add(1)
        prank = jnp.clip(jnp.cumsum(mark[:, :A], axis=1) - 1, 0, P - 1)
        if upto == "prank":
            return prank, lov
        nh_sel = jnp.take_along_axis(nh, psel, axis=1)
        packed = (
            ((pvals > 0).astype(jnp.int32) << 30)
            | (jnp.clip(nh_sel, 0, 31) << 25)
            | (psel << 13)
            | starts
        )
        pk = jnp.take_along_axis(packed, prank, axis=1)
        lo_at = jnp.take_along_axis(lov, prank, axis=1)
        return pk, lo_at

    tail_j = jax.jit(tail, static_argnames=("upto",))

    from blasr_tpu.ops.anchors import find_anchors

    @functools.partial(jax.jit, static_argnames=())
    def stage_d(codes, lengths, sa_valid, ctab16, lut, lut_valid):
        rc = M._revcomp_rows(codes, lengths)
        reads2 = jnp.concatenate([codes, rc], axis=0)
        lens2 = jnp.concatenate([lengths, lengths], axis=0)
        return find_anchors(
            reads2, lens2, sa_valid, None, None, lut, None, lut_valid,
            ctab16,
            k=k, max_hits_per_pos=KH, max_anchors_per_read=A,
            lut_meta=di.lut_meta, anchor_stride=stride,
        )

    def bench_one(name, fn, pick):
        r = fn()
        np.asarray(pick(r))
        N = 100
        t0 = time.time()
        for _ in range(N):
            r = fn()
        np.asarray(pick(r))
        print(f"  {name}: {(time.time()-t0)/N*1e3:.2f} ms")

    @jax.jit
    def stage_null(codes):
        return codes * 2

    bench_one("0. null (bias)    ", lambda: stage_null(codes), lambda r: r[:1, :1])
    bench_one("a. pack+rc        ", lambda: stage_a(codes, lengths), lambda r: r[:1, :1])
    bench_one("b. + ctab gathers ", lambda: stage_b(codes, lengths, ctab16), lambda r: r[0][:1, :1])
    bench_one("c. + pos top_k    ", lambda: stage_c(codes, lengths, ctab16), lambda r: r[0][:1, :1])
    bench_one("c2. + lov gather  ", lambda: tail_j(codes, lengths, ctab16, lut_valid, upto="lov"), lambda r: r[0][:1, :1])
    bench_one("c3. + scatter rank", lambda: tail_j(codes, lengths, ctab16, lut_valid, upto="prank"), lambda r: r[0][:1, :1])
    bench_one("c4. + packed take ", lambda: tail_j(codes, lengths, ctab16, lut_valid, upto="pk"), lambda r: r[0][:1, :1])
    bench_one("d. full anchors   ", lambda: stage_d(codes, lengths, sa_valid, ctab16, lut, lut_valid), lambda r: r[0][:1, :1])


if __name__ == "__main__":
    main()
