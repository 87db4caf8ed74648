"""Batch-granular checkpoint/resume of the mapping run."""

import json
import os

import numpy as np

from blasr_tpu.cli.blasr import main as blasr_main
from blasr_tpu.io.fasta import write_fasta
from blasr_tpu.sim import simulate_genome, simulate_reads


def _corpus(tmp_path, n=40):
    g = simulate_genome(60_000, seed=51, repeat_fraction=0.0)
    gp = str(tmp_path / "g.fa")
    write_fasta(gp, [("ref", g)])
    reads, _ = simulate_reads(g, n, mean_len=400, seed=52)
    rp = str(tmp_path / "r.fa")
    write_fasta(rp, [(r.name, r.codes) for r in reads])
    return rp, gp


def test_resume_continues_where_left(tmp_path):
    rp, gp = _corpus(tmp_path)
    out = str(tmp_path / "o.m4")
    common = [rp, gp, "-m", "4", "-out", out, "-resume",
              "-batchSize", "8", "-maxReadLen", "1024", "-minMatch", "13"]
    # full run as reference
    ref_out = str(tmp_path / "ref.m4")
    blasr_main([rp, gp, "-m", "4", "-out", ref_out,
                "-batchSize", "8", "-maxReadLen", "1024", "-minMatch", "13"])
    # fresh resumable run
    blasr_main(common)
    manifest = json.load(open(out + ".resume.json"))
    n_batches = manifest["batches_done"]
    assert n_batches >= 5
    full = sorted(open(out).read().strip().split("\n"))

    # simulate preemption: rewind manifest + truncate output to 2 batches
    lines = open(out).read().strip().split("\n")
    # count records of first 2 batches by re-running with hook? simpler:
    # truncate to the manifest of 2 and drop the file tail accordingly is
    # not reconstructible here — instead just rerun from batch 2 and check
    # no duplicates/missing vs the full set modulo the first 2 batches.
    manifest["batches_done"] = 2
    json.dump(manifest, open(out + ".resume.json", "w"))
    keep = []
    seen_batches = 0
    # deterministic batching: first 2 batches = first 16 reads of the
    # 1024-bucket ordering; emulate by keeping records of those reads
    from blasr_tpu.io.batching import batch_reads, read_records

    reads = read_records(rp)
    batches = list(batch_reads(reads, 8, 1024))
    first2 = {n for b in batches[:2] for n in b.names if n}
    # m4 qnames carry the reference /0_<len> whole-read suffix
    keep = [l for l in lines if l.split()[0].rpartition("/")[0] in first2]
    open(out, "w").write("\n".join(keep) + "\n")

    blasr_main(common)
    resumed = sorted(open(out).read().strip().split("\n"))
    assert resumed == full  # nothing missing, nothing duplicated
