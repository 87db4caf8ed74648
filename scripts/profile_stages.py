"""Profile the mapping pipeline on the real TPU: device compute vs tunnel RPC.

Measures, at the bench configuration (B=64, L=1024 bucket):
  1. steady-state DEVICE throughput: dispatch N batches back-to-back, fetch
     one byte at the end -> per-batch device time with zero host overhead
  2. per-transfer d2h cost of each MapBatchResult field (the host loop pays
     these per batch)
  3. h2d cost of the per-batch inputs
  4. e2e runner throughput for comparison

Run: python scripts/profile_stages.py [n_batches]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax
    import jax.numpy as jnp

    from blasr_tpu.index.artifacts import load_index
    from blasr_tpu.io.batching import batch_reads, read_records
    from blasr_tpu.params import MappingParams
    from blasr_tpu.pipeline.mapper import Mapper

    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata")
    genome_fa = os.path.join(bench_dir, "genome.fasta")
    reads_fa = os.path.join(bench_dir, "reads.fasta")
    if not os.path.exists(genome_fa):
        print("run bench.py once to build the corpus", file=sys.stderr)
        sys.exit(1)

    t0 = time.time()
    index = load_index(genome_fa, k=14)
    reads = read_records(reads_fa)
    import os as _os
    params = MappingParams(
        batch_size=int(_os.environ.get("BLASR_PROF_B", "64")),
        max_read_len=3072,
        n_candidates=int(_os.environ.get("BLASR_PROF_NC", "4")),
        n_dp_candidates=int(_os.environ.get("BLASR_PROF_CD", "4")),
        anchor_stride=int(_os.environ.get("BLASR_PROF_STRIDE", "1")),
        best_n=1,
    )
    print(f"load: {time.time()-t0:.1f}s  backend={jax.default_backend()}")

    batches = [
        b for b in batch_reads(reads, params.batch_size, params.max_read_len)
    ]
    # use only the most common bucket
    from collections import Counter

    caps = Counter(b.max_len for b in batches)
    cap = caps.most_common(1)[0][0]
    batches = [b for b in batches if b.max_len == cap][: n_batches + 2]
    print(f"bucket cap={cap}, using {len(batches)} batches of B=64")

    mapper = Mapper(index, params)

    def force(x):
        return np.asarray(x)

    # ---- warmup / compile ----
    t0 = time.time()
    r = mapper.map_batch(batches[0].codes, batches[0].lengths, batches[0].qual)
    force(r.wire[:1])
    print(f"compile+first: {time.time()-t0:.1f}s")

    # ---- 1. device-only throughput: dispatch all, fetch 1 byte at end ----
    t0 = time.time()
    results = []
    for b in batches:
        results.append(mapper.map_batch(b.codes, b.lengths, b.qual))
    t_disp = time.time() - t0
    force(results[-1].wire[:1])
    t_all = time.time() - t0
    per_batch_dev = t_all / len(batches)
    print(
        f"[device-only] dispatch {t_disp*1e3:.0f} ms, total {t_all*1e3:.0f} ms"
        f" -> {per_batch_dev*1e3:.1f} ms/batch = {64/per_batch_dev:.0f} reads/s"
    )

    # ---- 2. d2h per-field cost (results already computed above) ----
    # fetch each field of a few fresh results; each np.asarray = 1 RPC
    ts = []
    for r in results[:6]:
        t0 = time.time()
        force(r.wire)
        ts.append(time.time() - t0)
    a = np.asarray(results[0].wire)
    print(
        f"[d2h] wire shape={a.shape} {a.nbytes/1024:.0f} KiB:"
        f" min {min(ts)*1e3:.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:.1f} ms"
    )

    # ---- 3. h2d cost ----
    ts = []
    for b in batches[:6]:
        t0 = time.time()
        x = jnp.asarray(b.codes)
        y = jnp.asarray(b.lengths)
        # force the transfer to complete by reading back one element
        force(x[:1, :1]); force(y[:1])
        ts.append(time.time() - t0)
    print(
        f"[h2d] codes+lengths ({batches[0].codes.nbytes/1024:.0f} KiB):"
        f" min {min(ts)*1e3:.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:.1f} ms"
    )

    # ---- 4. e2e with full host drain (like the runner) ----
    from blasr_tpu.pipeline.runner import _finalize_batch

    t0 = time.time()
    from collections import deque

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=params.fetch_threads)
    inflight = deque()
    nrec = 0
    for b in batches:
        rr = mapper.map_batch(b.codes, b.lengths, b.qual)
        inflight.append((b, pool.submit(lambda r: r._replace(wire=np.asarray(r.wire)), rr)))
        if len(inflight) > params.dispatch_ahead:
            bb, fut = inflight.popleft()
            recs, _ = _finalize_batch(mapper, bb, fut.result())
            nrec += len(recs)
    while inflight:
        bb, fut = inflight.popleft()
        recs, _ = _finalize_batch(mapper, bb, fut.result())
        nrec += len(recs)
    t_e2e = time.time() - t0
    per_batch = t_e2e / len(batches)
    print(
        f"[e2e] {t_e2e*1e3:.0f} ms total -> {per_batch*1e3:.1f} ms/batch ="
        f" {64/per_batch:.0f} reads/s  ({nrec} records)"
    )

    # ---- 5. stage-isolated device timings (fresh process would be cleaner,
    # but jit caching makes these usable): run sub-jits N times ----
    from blasr_tpu.pipeline import mapper as M

    di = mapper.device_index
    codes = jnp.asarray(batches[0].codes)
    lengths = jnp.asarray(batches[0].lengths)
    force(codes[:1, :1])

    import functools

    from blasr_tpu.ops.anchors import find_anchors
    from blasr_tpu.ops.candidates import anchor_weights, select_candidates

    if di.lut_meta is not None and di.lut_meta[1] == 0:
        sa_arr, ctab16, lut, lut_valid = di.arrays
        sa_kmers = run_len = None
    else:
        sa_arr, sa_kmers, lut, run_len = di.arrays
        lut_valid = ctab16 = None

    # index arrays must be jit ARGUMENTS: closed-over device arrays become
    # jaxpr constants and blow the remote-compile request size limit
    @functools.partial(jax.jit, static_argnames=())
    def _stage_anchor(codes, lengths, sa_arr, sa_kmers, lut, run_len, lut_valid, ctab16):
        rc = M._revcomp_rows(codes, lengths)
        reads2 = jnp.concatenate([codes, rc], axis=0)
        lens2 = jnp.concatenate([lengths, lengths], axis=0)
        return find_anchors(
            reads2, lens2, sa_arr, sa_kmers, None, lut, run_len, lut_valid,
            ctab16,
            k=di.k,
            max_hits_per_pos=params.max_anchors_per_position,
            max_anchors_per_read=params.max_anchors_per_read,
            lut_meta=di.lut_meta,
            anchor_stride=params.anchor_stride,
        )

    def stage_anchor(codes, lengths):
        return _stage_anchor(codes, lengths, sa_arr, sa_kmers, lut, run_len, lut_valid, ctab16)

    at, aq, anh, avalid = stage_anchor(codes, lengths)
    force(at[:1, :1])
    t0 = time.time()
    N = 10
    for _ in range(N):
        at, aq, anh, avalid = stage_anchor(codes, lengths)
    force(at[:1, :1])
    t_anchor = (time.time() - t0) / N
    print(f"[stage] anchors:    {t_anchor*1e3:.1f} ms/batch")

    W = params.band_width_for(cap)
    G = di.genome_len

    @jax.jit
    def stage_cand(at, aq, anh, avalid):
        aw = anchor_weights(anh, avalid, G, W, params.pval_type)
        return select_candidates(
            at, aq, aw, avalid, n_candidates=params.n_candidates, win=W, k=di.k
        )

    cand = stage_cand(at, aq, anh, avalid)
    force(cand.d0[:1, :1])
    t0 = time.time()
    for _ in range(N):
        cand = stage_cand(at, aq, anh, avalid)
    force(cand.d0[:1, :1])
    t_cand = (time.time() - t0) / N
    print(f"[stage] candidates: {t_cand*1e3:.1f} ms/batch")

    # candidate sub-stages
    aw = anchor_weights(at * 0 + anh, avalid, G, W, params.pval_type)

    @jax.jit
    def sub_sort(t, q, w, valid):
        BIG = jnp.int32(2**30)
        d = t - q
        order = jnp.argsort(jnp.where(valid, d, BIG), axis=1)
        return (
            jnp.take_along_axis(d, order, axis=1),
            jnp.take_along_axis(w, order, axis=1),
        )

    ds, ws = sub_sort(at, aq, aw, avalid)
    force(ds[:1, :1])
    t0 = time.time()
    for _ in range(N):
        ds, ws = sub_sort(at, aq, aw, avalid)
    force(ds[:1, :1])
    print(f"[stage]   cand/sort:      {(time.time()-t0)/N*1e3:.1f} ms")

    @jax.jit
    def sub_search(ds):
        return jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))(ds, ds + W)

    hi = sub_search(ds)
    force(hi[:1, :1])
    t0 = time.time()
    for _ in range(N):
        hi = sub_search(ds)
    force(hi[:1, :1])
    print(f"[stage]   cand/searchsorted: {(time.time()-t0)/N*1e3:.1f} ms")

    # walk timing: isolate via the full map step minus... measure walk by
    # calling walk_arrows_device on a fresh DP run
    from blasr_tpu.ops.banded_align import AlignScores, make_qoff
    from blasr_tpu.ops.banded_pallas import banded_align_pallas
    from blasr_tpu.ops.traceback_device import walk_arrows_device

    CD = params.dp_candidates
    I = 64 * CD
    L = cap
    T = L + params.target_pad
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.integers(0, 4, (I, L)).astype(np.uint8))
    Tc = jnp.asarray(rng.integers(0, 4, (I, T)).astype(np.uint8))
    qlen = jnp.full((I,), L, jnp.int32)
    tlo = jnp.zeros((I,), jnp.int32)
    thi = jnp.full((I,), T, jnp.int32)
    qoff = jnp.asarray(make_qoff(L, T, W, params.target_pad // 2))

    @jax.jit
    def stage_dp(Q, Tc):
        return banded_align_pallas(
            Q, qlen, Tc, tlo, thi, qoff, None,
            scores=AlignScores(), with_traceback=True, band_width=W,
        )

    r = stage_dp(Q, Tc)
    force(r.score[:1])
    t0 = time.time()
    for _ in range(N):
        r = stage_dp(Q, Tc)
    force(r.score[:1])
    print(f"[stage] DP(traceback) I={I}: {(time.time()-t0)/N*1e3:.1f} ms")

    @jax.jit
    def stage_walk(arrows, best_a, best_w, score, Q, Tc):
        return walk_arrows_device(
            arrows, qoff, best_a, best_w, score, Q, Tc,
            qoff_params=(params.target_pad // 2, W, L),
            pack=(128 // W) if W < 128 else 1,
        )

    tb = stage_walk(r.arrows, r.best_a, r.best_w, jnp.minimum(r.score, -1), Q, Tc)
    force(tb.nops[:1])
    t0 = time.time()
    for _ in range(N):
        tb = stage_walk(r.arrows, r.best_a, r.best_w, jnp.minimum(r.score, -1), Q, Tc)
    force(tb.nops[:1])
    print(f"[stage] walk I={I}: {(time.time()-t0)/N*1e3:.1f} ms")

    print(
        f"\nsummary: device/batch {per_batch_dev*1e3:.1f} ms | e2e/batch"
        f" {per_batch*1e3:.1f} ms | host+rpc overhead"
        f" {(per_batch-per_batch_dev)*1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
