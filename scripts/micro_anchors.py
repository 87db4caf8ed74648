"""Decompose the anchors + candidate-setup device spans at bench shapes.

The single-dispatch micro timings (micro_setup.py) carry ~2 ms of axon
per-dispatch overhead — comparable to the costs being measured. Here each
op runs R times inside ONE jitted lax.scan (carry-chained outputs defeat
CSE/LICM), so the per-iteration cost is dispatch-free.

Run: python scripts/micro_anchors.py [R]
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

    from blasr_tpu.index.artifacts import load_index
    from blasr_tpu.io.batching import batch_reads, read_records
    from blasr_tpu.ops.anchors import (
        _expand_select_compact, pack_query_kmers,
    )
    from blasr_tpu.ops.candidates import (
        anchor_weights, chain_stats, select_candidates,
    )
    from blasr_tpu.params import MappingParams
    from blasr_tpu.pipeline.mapper import Mapper, _revcomp_rows

    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata")
    index = load_index(os.path.join(bench_dir, "genome.fasta"), k=14)
    reads = read_records(os.path.join(bench_dir, "reads.fasta"))
    B = int(os.environ.get("BLASR_PROF_B", "256"))
    params = MappingParams(
        batch_size=B, max_read_len=3328, n_candidates=4,
        n_dp_candidates=2, anchor_stride=4, best_n=1,
        max_anchors_per_read=128, narrow_band=32, narrow_band_max=3328,
    )
    mapper = Mapper(index, params)
    di = mapper.device_index
    batch = next(
        b for b in batch_reads(reads, B, 3328) if b.max_len == 1024
    )
    codes = jnp.asarray(batch.codes)
    lengths = jnp.asarray(batch.lengths)
    k = di.k
    A = params.max_anchors_per_read
    KH = params.max_anchors_per_position
    ST = params.anchor_stride
    C = params.n_candidates
    CW = 128

    rc = _revcomp_rows(codes, lengths)
    reads2 = jnp.concatenate([codes, rc], axis=0)
    lens2 = jnp.concatenate([lengths, lengths], axis=0)
    assert di.kind == "sa" and di.lut_meta is not None and di.lut_meta[1] == 0
    sa_v, ctab16, lut_full, lut_valid = di.arrays
    G = di.genome_len

    print(f"backend={jax.default_backend()} B={B} L=1024 ST={ST} A={A}",
          flush=True)

    def timed(name, fn, *args):
        """fn(salt, *args) -> array; runs R times in one scan dispatch.
        Big device arrays MUST come in via *args (a zero-arg jit would
        inline them as HLO constants and blow the remote-compile payload).
        salt is {0, 1}, data-dependent on the previous iteration's output
        — cheap at every use site but unfoldable, so the compiler can
        neither CSE nor hoist the body out of the scan."""
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
        print(f"  {name:<36} {dt:6.3f} ms/iter", flush=True)
        return dt

    # (a) k-mer packing (both strands)
    timed("pack_query_kmers (2B)", lambda salt, r2: pack_query_kmers(
        r2 + salt.astype(jnp.uint8), lens2, k, ST).astype(jnp.int32),
        reads2)

    qk = pack_query_kmers(reads2, lens2, k, ST)
    L = qk.shape[1]

    # (b) ctab16 gather (the per-position frequency lookup)
    def f_ctab(salt, qk, ctab16):
        qs = jnp.clip(qk + salt, 0, ctab16.shape[0] - 1)
        return ctab16[qs].astype(jnp.int32)
    timed(f"ctab16 gather (2B x {L})", f_ctab, qk, ctab16)

    cv = ctab16[jnp.clip(qk, 0, ctab16.shape[0] - 1)].astype(jnp.int32)
    cv = jnp.where(qk >= 0, cv, 0)
    nh = cv >> 8
    nh_v = cv & 255
    pos_has = (qk >= 0) & (nh > 0) & (nh <= KH) & (nh_v > 0)
    stride = max(1, (2 * L * KH) // max(A, 1) // 2)
    base = jnp.int32(1 << 20)
    pos_ar = jnp.arange(L, dtype=jnp.int32)
    pos_prio = base - nh * 16 + jnp.where(
        (pos_ar % stride) == 0, base // 2, 0)
    pos_prio = jnp.where(pos_has, pos_prio, jnp.int32(-1))
    P = min(A, L)

    # (c) position top_k inside the slot-exact expansion
    def f_topk(salt, pos_prio):
        return jax.lax.top_k(pos_prio + salt, P)[0]
    timed(f"pos top_k (2B x {L} -> {P})", f_topk, pos_prio)

    # (d) the full slot-exact expansion (includes c)
    def f_exp(salt, sa_v, lut_valid, qk, nh, nh_v):
        at, aq, anh, av = _expand_select_compact(
            sa_v, lut_valid, qk + salt, qk, nh, qk >= 0,
            2 * B, L, KH, A, ST, nh_valid=nh_v,
        )
        return at
    timed("slot-exact expand (incl top_k)", f_exp,
          sa_v, lut_valid, qk, nh, nh_v)

    at, aq, anh, av = _expand_select_compact(
        sa_v, lut_valid, qk, qk, nh, qk >= 0,
        2 * B, L, KH, A, ST, nh_valid=nh_v,
    )

    # (e) anchor_weights + select_candidates
    def f_sel(salt, at, aq, anh, av):
        aw = anchor_weights(anh + salt, av, G, CW, params.pval_type)
        cand = select_candidates(at, aq, aw, av, n_candidates=C, win=CW, k=k)
        return cand.d0
    timed("anchor_weights + select_candidates", f_sel, at, aq, anh, av)

    aw = anchor_weights(anh, av, G, CW, params.pval_type)
    cand = select_candidates(at, aq, aw, av, n_candidates=C, win=CW, k=k)

    # (f) chain_stats
    def f_chain(salt, at, aq, av, dstar, cvalid):
        n_chain, ch_any, cmass, corners = chain_stats(
            at + salt, aq, av, dstar, cvalid, k=k, win=CW,
        )
        return n_chain
    timed("chain_stats", f_chain, at, aq, av, cand.dstar, cand.valid)

    # (g) genome word gather at I=B*CD, T=1280
    CD = 2
    I = B * CD
    T = 1280
    NW8 = T // 8 + 2
    rng = np.random.default_rng(0)
    t0f = jnp.asarray(rng.integers(0, G - T, I).astype(np.int32))

    def f_gw(salt, t0f, gp):
        widx = ((t0f + salt) >> 3)[:, None] + jnp.arange(
            NW8, dtype=jnp.int32)[None, :]
        return gp[jnp.clip(widx, 0, gp.shape[0] - 1)]
    timed(f"genome word gather ({I} x {NW8})", f_gw, t0f, di.genome_pad)

    # (h) anchor row gathers at (I x A) + slope-fit arithmetic
    row = jnp.asarray(rng.integers(0, 2 * B, I).astype(np.int32))
    aqv = ((aq << 1) | av.astype(jnp.int32))

    def f_rows(salt, row, at, aqv):
        r2 = jnp.clip(row + salt, 0, 2 * B - 1)
        return at[r2] + aqv[r2]
    timed(f"anchor row gathers 2x ({I} x {A})", f_rows, row, at, aqv)

    def f_slope(salt, row, at, aq, t0f):
        atr = at[jnp.clip(row + salt, 0, 2 * B - 1)].astype(jnp.float32)
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
        slope_i = jnp.where(
            denom > 1e3,
            (n_a * sqd - sq * sd) / jnp.maximum(denom, 1.0), jnp.nan)
        return jnp.nanmedian(slope_i)[None]
    timed("slope fit + nanmedian (incl rows)", f_slope, row, at, aq, t0f)


if __name__ == "__main__":
    main()
