"""blasr-tpu command line (L7).

Mirrors the reference CLI surface (Blasr.cpp:3996-4139 flag registry,
MappingParameters::MakeSane) for the flags that matter to mapping runs, with
the same single-dash spelling so benchmark scripts can swap binaries:

    blasr-tpu reads.{fasta,fastq} genome.fasta -m 4 -out out.m4 -bestn 2 ...

Usage: python -m blasr_tpu.cli.blasr <reads> <genome> [options]
"""

from __future__ import annotations

import argparse
import sys

from blasr_tpu.params import MappingParams


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="blasr-tpu",
        description="TPU-native long-read aligner (BLASR-capability framework)",
    )
    p.add_argument("reads", help="reads file (FASTA/FASTQ)")
    p.add_argument("genome", help="reference genome FASTA")
    p.add_argument("-m", type=int, default=4, choices=[0, 1, 4, 5],
                   help="output format (0=stick,1=columns,4=interval,5=verbose)")
    p.add_argument("-sam", action="store_true", help="write SAM output")
    p.add_argument("-out", default="-", help="output file (default stdout)")
    p.add_argument("-clipping", default="soft", choices=["none", "soft", "hard"])
    p.add_argument("-bestn", type=int, default=1)
    p.add_argument("-nCandidates", type=int, default=6)
    p.add_argument("-minMatch", type=int, default=14)
    p.add_argument("-maxScore", type=int, default=-200)
    p.add_argument("-minPctIdentity", type=float, default=0.0)
    p.add_argument("-minAlnLength", type=int, default=0)
    p.add_argument("-maxAnchorsPerPosition", type=int, default=8)
    p.add_argument("-indel", type=int, default=5)
    p.add_argument("-affineOpen", type=int, default=50)
    p.add_argument("-affineExtend", type=int, default=0)
    p.add_argument("-maxReadLen", type=int, default=3072,
                   help="pad bound; longer reads are truncated (piecewise path TBD)")
    p.add_argument("-batchSize", type=int, default=64)
    p.add_argument("-header", action="store_true", help="m4 header line")
    p.add_argument("-noSplitSubreads", action="store_true", help="(accepted; subread splitting TBD)")
    p.add_argument("-nproc", type=int, default=1, help="(accepted; device batching replaces threads)")
    return p


def params_from_args(args) -> MappingParams:
    best_n = max(1, args.bestn)
    return MappingParams(
        min_match_length=args.minMatch,
        max_anchors_per_position=args.maxAnchorsPerPosition,
        n_candidates=max(args.nCandidates, best_n),
        best_n=best_n,
        insertion_score=args.indel,
        deletion_score=args.indel,
        affine_open=args.affineOpen,
        affine_extend=args.affineExtend,
        max_score=args.maxScore,
        min_pct_similarity=args.minPctIdentity,
        min_align_length=args.minAlnLength,
        max_read_len=args.maxReadLen,
        batch_size=args.batchSize,
    )


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    params = params_from_args(args)
    params.validate()

    from blasr_tpu.index.artifacts import load_index
    from blasr_tpu.io.batching import read_records
    from blasr_tpu.output.m4 import write_m4
    from blasr_tpu.output.sam_writer import write_sam
    from blasr_tpu.pipeline.runner import run_mapping

    index = load_index(args.genome, k=params.min_match_length)
    reads = read_records(args.reads)
    records, unmapped = run_mapping(index, reads, params)

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        if args.sam:
            write_sam(records, reads, index.seqdb, out,
                      clipping=args.clipping,
                      program_line=" ".join(sys.argv),
                      unmapped=unmapped)
        elif args.m == 4:
            write_m4(records, out, header=args.header)
        else:
            from blasr_tpu.output.verbose import write_verbose

            write_verbose(records, reads, index, out, fmt=args.m)
    finally:
        if out is not sys.stdout:
            out.close()
    print(
        f"Finished mapping {len(reads) - len(unmapped)}/{len(reads)} reads",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
