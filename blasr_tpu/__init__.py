"""blasr_tpu — a TPU-native long-read alignment framework.

A from-scratch re-design of the capabilities of BLASR (the PacBio long-read
aligner, reference: mchaisso/blasr) for TPU hardware:

  * host side  — FASTA/FASTQ/SAM ingest, suffix-array index construction,
                 traceback replay, output formatting (C++/numpy)
  * device side — batched suffix-array anchor search, diagonal-bin candidate
                 selection, anchor chaining, and wavefront banded affine-gap
                 dynamic programming, all as JAX/XLA/Pallas programs over
                 padded read batches; scaled over device meshes with
                 jax.sharding + shard_map.

Layer map (mirrors reference layers L0-L7 described in SURVEY.md):

  core/      L0  sequence encoding (2-bit codes, packing, revcomp)
  io/        L1  FASTA/FASTQ/SAM readers, seq database, read batching
  index/     L2  suffix array + k-mer lookup index ("sawriter" equivalent)
  ops/       L3+L4 device compute: anchoring, chaining, banded DP, MAPQ
  pipeline/  L5  per-batch mapping orchestration + host traceback
  output/    L6  SAM / m0-m5 formatters
  cli/       L7  command-line drivers (blasr-tpu, sawriter-tpu)
  parallel/  —   mesh construction, sharded mapping step
"""

__version__ = "0.1.0"

from blasr_tpu.params import MappingParams  # noqa: F401
