"""Diagnostic dumps (role of the reference's -anchors / -clusters side
channels, Blasr.cpp:2309-2333 anchor dump and :4536 cluster stats)."""

from __future__ import annotations

from typing import IO, Sequence

import jax.numpy as jnp
import numpy as np

from blasr_tpu.index.artifacts import GenomeIndex
from blasr_tpu.io.batching import Read, batch_reads
from blasr_tpu.ops.anchors import find_anchors
from blasr_tpu.params import MappingParams
from blasr_tpu.pipeline.mapper import _revcomp_rows


def dump_anchors(
    index: GenomeIndex,
    reads: Sequence[Read],
    params: MappingParams,
    out: IO[str],
) -> None:
    """Write every anchor as 'read_name strand qpos tpos nhits'."""
    sa = jnp.asarray(index.sa.astype(np.int32))
    sk = jnp.asarray(index.sa_kmers)
    pk = jnp.asarray(index.pos_ok)
    for batch in batch_reads(reads, params.batch_size, params.max_read_len):
        codes = jnp.asarray(batch.codes)
        lengths = jnp.asarray(batch.lengths)
        rc = _revcomp_rows(codes, lengths)
        B = batch.codes.shape[0]
        for strand, strand_codes in ((0, codes), (1, rc)):
            t, q, nh, valid = find_anchors(
                strand_codes, lengths, sa, sk, pk,
                k=index.k,
                max_hits_per_pos=params.max_anchors_per_position,
                max_anchors_per_read=params.max_anchors_per_read,
            )
            t = np.asarray(t); q = np.asarray(q)
            nh = np.asarray(nh); valid = np.asarray(valid)
            for b in range(B):
                if batch.indices[b] < 0:
                    continue
                name = batch.names[b]
                order = np.argsort(q[b])
                for i in order:
                    if valid[b][i]:
                        out.write(
                            f"{name} {strand} {q[b][i]} {t[b][i]} {nh[b][i]}\n"
                        )
