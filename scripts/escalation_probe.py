"""Measure the band-overflow signature on the bursty published-CLR corpus.

Question for the band-escalation design (ROADMAP round-5 item 1): when the
W=32 narrow band is stretched to every bucket (NBMAX=3328), the bursty
corpus loses ~2% start-locus accuracy. Can the victims be DETECTED from
their primary-pass records (query coverage / similarity / score-per-base),
so a cheap retry of the few flagged reads through the wide guided band
restores accuracy without paying per-item roll costs on every read?

Prints, for narrow-pass records joined against truth: per-read correct?,
qcov, pct_similarity, score/qlen — then candidate trigger ROC points.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BENCH_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
)
GENOME_FA = os.path.join(BENCH_DIR, "genome.fasta")
READS_FA = os.path.join(BENCH_DIR, "independent_reads.fasta")


def main() -> None:
    from blasr_tpu.index.artifacts import load_index
    from blasr_tpu.io.batching import read_records
    from blasr_tpu.params import MappingParams
    from blasr_tpu.pipeline.runner import run_mapping
    from blasr_tpu.sim import parse_truth

    index = load_index(GENOME_FA, k=14)
    reads = read_records(READS_FA)
    params = MappingParams(
        batch_size=64, max_read_len=3328, n_candidates=4, n_dp_candidates=2,
        anchor_stride=4, max_anchors_per_read=128,
        narrow_band=32, narrow_band_max=3328, best_n=1,
    )
    t0 = time.time()
    records, unmapped = run_mapping(index, reads, params)
    print(f"narrow pass: {time.time()-t0:.1f}s, {len(unmapped)} unmapped",
          file=sys.stderr)

    byname = {}
    for r in records:
        cur = byname.get(r.qname)
        if cur is None or r.score < cur.score:
            byname[r.qname] = r

    rows = []
    for rd in reads:
        rec = byname.get(rd.name)
        start, end, strand = parse_truth(rd.name)
        if rec is None:
            rows.append((rd.name, len(rd.codes), 0, 0.0, 0.0, 0.0))
            continue
        ok = int(
            rec.tstrand == strand
            and abs(rec.tstart_fwd - start) < 100
            and abs(rec.tend_fwd - end) < 100
        )
        qcov = (rec.qend - rec.qstart) / max(rec.qlength, 1)
        spb = rec.score / max(rec.qend - rec.qstart, 1)
        rows.append((rd.name, rec.qlength, ok, qcov, rec.pct_similarity, spb))

    arr = np.array([(r[1], r[2], r[3], r[4], r[5]) for r in rows], dtype=np.float64)
    qlen, ok, qcov, sim, spb = arr.T
    n = len(rows)
    print(f"n={n} accuracy={ok.mean():.4f}")
    bad = ok == 0
    print(f"wrong: {int(bad.sum())}  (len: med {np.median(qlen[bad]):.0f})")
    for name, stat in (("qcov", qcov), ("sim", sim), ("score/base", spb)):
        print(
            f"{name:11s} correct: med {np.median(stat[~bad]):.3f} "
            f"p5 {np.percentile(stat[~bad], 5):.3f} | "
            f"wrong: med {np.median(stat[bad]):.3f} "
            f"p95 {np.percentile(stat[bad], 95):.3f}"
        )
    # trigger ROC: flag = qcov < thr (plus always-flag unmapped)
    print("\ntrigger sweep: flag if qcov < thr")
    for thr in (0.80, 0.85, 0.90, 0.925, 0.95, 0.97, 0.98):
        flag = qcov < thr
        caught = (flag & bad).sum()
        print(
            f"  thr={thr:.3f}: flags {int(flag.sum()):4d}/{n} "
            f"({flag.mean()*100:4.1f}%), catches {int(caught)}/{int(bad.sum())} wrong"
        )
    print("\ntrigger sweep: flag if score/base > thr (less negative = weaker)")
    for thr in (-4.0, -3.8, -3.6, -3.4, -3.2, -3.0):
        flag = spb > thr
        caught = (flag & bad).sum()
        print(
            f"  thr={thr:.2f}: flags {int(flag.sum()):4d}/{n} "
            f"({flag.mean()*100:4.1f}%), catches {int(caught)}/{int(bad.sum())} wrong"
        )
    # combined
    print("\ncombined: qcov < 0.95 OR sim < 78")
    flag = (qcov < 0.95) | (sim < 78)
    print(
        f"  flags {int(flag.sum())}/{n} ({flag.mean()*100:.1f}%), "
        f"catches {int((flag & bad).sum())}/{int(bad.sum())}"
    )
    np.save("/tmp/escalation_rows.npy", arr)


if __name__ == "__main__":
    main()
