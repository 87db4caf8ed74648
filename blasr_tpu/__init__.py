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

import os as _os


def _setup_compilation_cache() -> None:
    """Persist XLA compilations across processes.

    The mapping step compiles once per (batch, length-bucket) shape; on the
    tunneled TPU backend a cold compile of the full pipeline takes minutes,
    so a persistent on-disk cache (shared by CLI runs, tests and bench) is
    part of the framework's startup path, mirroring the reference's
    build-once index auto-discovery ethos (Blasr.cpp:4375-4449).
    """
    if _os.environ.get("BLASR_TPU_NO_CACHE"):
        return
    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "blasr_tpu_xla"),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_compilation_cache()

from blasr_tpu.params import MappingParams  # noqa: F401
