"""Cumulative in-context profile of _map_batch_impl on the real TPU.

Times the REAL jitted pipeline cut at successive checkpoints (stop_after),
so marginal stage costs include XLA fusion effects and use the exact bench
operating point. Each checkpoint returns a consuming scalar (no DCE).

Run: python scripts/profile_cumulative.py [stride] [cd]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cd = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    A = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax
    import jax.numpy as jnp

    from blasr_tpu.index.artifacts import load_index
    from blasr_tpu.io.batching import batch_reads, read_records
    from blasr_tpu.params import MappingParams
    from blasr_tpu.pipeline.mapper import Mapper, _map_batch_impl

    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
    )
    index = load_index(os.path.join(bench_dir, "genome.fasta"), k=14)
    reads = read_records(os.path.join(bench_dir, "reads.fasta"))
    W = int(os.environ.get("BLASR_PROF_W", "32"))
    B = int(os.environ.get("BLASR_PROF_B", "64"))
    params = MappingParams(
        batch_size=B, max_read_len=3328, n_candidates=4,
        n_dp_candidates=cd, anchor_stride=stride, best_n=1,
        max_anchors_per_read=A, narrow_band=W,
        narrow_band_max=int(os.environ.get("BLASR_PROF_NBMAX", "1536")),
    )
    mapper = Mapper(index, params)
    di = mapper.device_index

    batches = [
        b for b in batch_reads(reads, params.batch_size, params.max_read_len)
        if b.max_len == 1024
    ]
    codes = jnp.asarray(batches[0].codes)
    lengths = jnp.asarray(batches[0].lengths)
    np.asarray(codes[:1, :1])
    print(f"backend={jax.default_backend()} B={B} stride={stride} CD={cd} A={A}")

    from blasr_tpu.pipeline.mapper import default_use_pallas

    kw = dict(
        params=params, pad=di.pad, k=di.k, genome_len=di.genome_len,
        use_pallas=default_use_pallas(), index_kind=di.kind, fm_n=di.fm_n,
        lut_meta=di.lut_meta,
    )

    stages = [
        "anchors", "candidates", "twords", "tcodes", "qitems",
        "setup", "slope", "dp", "walk", "filters", "presel", None,
    ]
    prev = 0.0
    for st in stages:
        def fn():
            return _map_batch_impl(
                codes, lengths, di.genome_pad, di.arrays, di.starts, None,
                stop_after=st, **kw,
            )
        r = fn()
        pick = (lambda x: x) if st is not None else (lambda x: x.sel_ints[:1, :1])
        np.asarray(pick(r))
        N = 50
        t0 = time.time()
        for _ in range(N):
            r = fn()
        np.asarray(pick(r))
        dt = (time.time() - t0) / N * 1e3
        name = st or "FULL"
        print(f"  {name:<11} cum {dt:6.2f} ms   (+{dt - prev:5.2f})")
        prev = dt


if __name__ == "__main__":
    main()
