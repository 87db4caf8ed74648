"""On-device traceback walk over stored arrow bytes (L4).

The reference recovers paths with an in-DP pointer walk on the host CPU
(e.g. KBandAlign.h traceback loop). On TPU the arrow tensor produced by the
wavefront DP (ops/banded_align.py) lives in HBM and is far too large to ship
to the host (the host link is the slowest resource in the system), so the
walk runs on device as a ``lax.while_loop`` vectorized across all alignments
of a batch; only a 2-bit-packed move string (~1% of the arrow bytes) plus
scalar stats leave the chip.

Alignment stats mirror ComputeAlignmentStats (AlignmentUtils.h:536).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from blasr_tpu.ops.banded_align import (
    SRC_DIAG,
    SRC_DIAG_START,
    SRC_E,
    SRC_F,
    SRC_LEFT,
    SRC_STOP,
    SRC_UP,
)

OP_NONE, OP_M, OP_I, OP_D = 0, 1, 2, 3


class DeviceTraceback(NamedTuple):
    """Compact per-alignment traceback (device arrays, host-transfer ready).

    moves_packed holds the ops in END->START order, 4 ops per byte
    (op j lives in byte j//4, bits 2*(j%4)); codes are OP_M/OP_I/OP_D.
    Spans are half-open local window coordinates like AlignmentPath.
    """

    moves_packed: jax.Array  # (I, P) uint8
    nops: jax.Array          # (I,) int32
    q_start: jax.Array       # (I,) int32
    q_end: jax.Array         # (I,) int32
    t_start: jax.Array       # (I,) int32
    t_end: jax.Array         # (I,) int32
    n_match: jax.Array       # (I,) int32
    n_mismatch: jax.Array    # (I,) int32
    n_ins: jax.Array         # (I,) int32
    n_del: jax.Array         # (I,) int32


def packed_width(S: int) -> int:
    S2 = S + 3
    return (S2 + 3) // 4


@functools.partial(jax.jit, static_argnames=())
def walk_arrows_device(
    arrows: jax.Array,   # (S, IA, W) uint8
    qoff: jax.Array,     # (S,) int32
    best_a: jax.Array,   # (I,) int32
    best_w: jax.Array,   # (I,) int32
    scores: jax.Array,   # (I,) int32 (< 0 where an alignment exists)
    query: jax.Array,    # (I, L) uint8
    target: jax.Array,   # (I, T) uint8
    item_idx: jax.Array | None = None,  # (I,) int32 column of each walk in arrows
) -> DeviceTraceback:
    """Walk I paths through an (S, IA, W) arrow tensor.

    item_idx maps walk i -> arrow column (IA >= I), so a walk over a
    selected subset (the per-read winners) reads the full-candidate arrow
    tensor in place instead of gathering a copy.
    """
    S, IA, W = arrows.shape
    I = best_a.shape[0]
    L = query.shape[1]
    T = target.shape[1]
    S2 = S + 3  # op slots + one dump column for non-emitting lanes
    rows = jnp.arange(I, dtype=jnp.int32)           # walk-local row index
    ii = rows if item_idx is None else item_idx.astype(jnp.int32)  # arrow column
    flat = arrows.reshape(-1)
    s1 = jnp.diff(qoff, prepend=qoff[:1]).astype(jnp.int32)  # (S,)

    max_iter = 2 * S + 4

    def cond(carry):
        a, w, st, active, nops, moves, it = carry
        return jnp.any(active) & (it < max_iter)

    def body(carry):
        a, w, st, active, nops, moves, it = carry
        ac = jnp.clip(a, 0, S - 1)
        wc = jnp.clip(w, 0, W - 1)
        byte = flat[(ac * IA + ii) * W + wc].astype(jnp.int32)
        src = byte & 7
        ebit = (byte >> 3) & 1
        fbit = (byte >> 4) & 1
        cs1 = s1[ac]
        cs2 = s1[jnp.clip(ac - 1, 0, S - 1)]

        is_h = st == 0
        is_e = st == 1
        is_f = st == 2
        diag = is_h & ((src == SRC_DIAG) | (src == SRC_DIAG_START))
        up = is_h & (src == SRC_UP)
        left = is_h & (src == SRC_LEFT)
        to_e = is_h & (src == SRC_E)
        to_f = is_h & (src == SRC_F)
        h_stop = is_h & (src == SRC_STOP)

        emit = jnp.where(
            diag, OP_M,
            jnp.where(up | is_f, OP_I, jnp.where(left | is_e, OP_D, OP_NONE)),
        ).astype(jnp.uint8)
        da = jnp.where(diag, -2, jnp.where(to_e | to_f | h_stop, 0, -1))
        dw = jnp.where(
            diag, cs1 + cs2 - 1,
            jnp.where(up | is_f, cs1 - 1, jnp.where(left | is_e, cs1, 0)),
        )
        new_st = jnp.where(
            is_h,
            jnp.where(to_e, 1, jnp.where(to_f, 2, 0)),
            jnp.where(is_e, jnp.where(ebit == 1, 1, 0), jnp.where(fbit == 1, 2, 0)),
        ).astype(jnp.int32)
        stop = (is_h & (src == SRC_DIAG_START)) | h_stop

        has_emit = active & (emit > 0)
        col = jnp.where(has_emit, nops, S2 - 1)
        moves = moves.at[rows, col].set(jnp.where(has_emit, emit, jnp.uint8(0)))
        nops = nops + has_emit.astype(jnp.int32)

        a = jnp.where(active, a + da, a)
        w = jnp.where(active, w + dw, w)
        st = jnp.where(active, new_st, st)
        active = active & ~stop & (a >= 0) & (w >= 0) & (w < W)
        return a, w, st, active, nops, moves, it + 1

    UNROLL = 4  # sub-steps per while iteration (amortizes loop overhead)

    def body_unrolled(carry):
        for _ in range(UNROLL):
            carry = body(carry)
        return carry

    init = (
        best_a.astype(jnp.int32),
        best_w.astype(jnp.int32),
        jnp.zeros(I, jnp.int32),
        scores < 0,
        jnp.zeros(I, jnp.int32),
        jnp.zeros((I, S2), jnp.uint8),
        jnp.int32(0),
    )
    _, _, _, _, nops, moves, _ = jax.lax.while_loop(cond, body_unrolled, init)

    # ---- stats (vectorized over the move strings; END->START order) ----
    jidx = jnp.arange(S2, dtype=jnp.int32)[None, :]
    is_op = jidx < nops[:, None]
    mv = jnp.where(is_op, moves, jnp.uint8(0))
    n_ins = jnp.sum(mv == OP_I, axis=1).astype(jnp.int32)
    n_del = jnp.sum(mv == OP_D, axis=1).astype(jnp.int32)
    n_mops = jnp.sum(mv == OP_M, axis=1).astype(jnp.int32)

    q_end = qoff[jnp.clip(best_a, 0, S - 1)] + best_w + 1
    t_end = best_a - (q_end - 1) + 1
    q_start = q_end - (n_mops + n_ins)
    t_start = t_end - (n_mops + n_del)

    qcons = (mv == OP_M) | (mv == OP_I)
    tcons = (mv == OP_M) | (mv == OP_D)
    qpos = q_end[:, None] - jnp.cumsum(qcons, axis=1)
    tpos = t_end[:, None] - jnp.cumsum(tcons, axis=1)
    qc = jnp.take_along_axis(query, jnp.clip(qpos, 0, L - 1), axis=1)
    tc = jnp.take_along_axis(target, jnp.clip(tpos, 0, T - 1), axis=1)
    ism = mv == OP_M
    n_match = jnp.sum(ism & (qc == tc) & (qc < 4), axis=1).astype(jnp.int32)

    # ---- 2-bit pack ----
    P = packed_width(S)
    pad = 4 * P - S2
    mvp = jnp.pad(mv, ((0, 0), (0, pad))).reshape(I, P, 4).astype(jnp.uint8)
    shifts = jnp.array([0, 2, 4, 6], jnp.uint8)
    packed = jnp.sum(
        mvp.astype(jnp.int32) << shifts[None, None, :].astype(jnp.int32), axis=2
    ).astype(jnp.uint8)

    return DeviceTraceback(
        moves_packed=packed,
        nops=nops,
        q_start=q_start.astype(jnp.int32),
        q_end=q_end.astype(jnp.int32),
        t_start=t_start.astype(jnp.int32),
        t_end=t_end.astype(jnp.int32),
        n_match=n_match,
        n_mismatch=(n_mops - n_match).astype(jnp.int32),
        n_ins=n_ins,
        n_del=n_del,
    )


def unpack_moves(packed_row: np.ndarray, nops: int) -> np.ndarray:
    """Host-side: unpack one move string to START->END op order (uint8)."""
    from blasr_tpu import native

    out = native.unpack_moves(packed_row, nops)
    if out is not None:
        return out
    b = packed_row[:, None] >> np.array([0, 2, 4, 6], np.uint8)[None, :]
    ops_rev = (b & 3).reshape(-1)[:nops]
    return ops_rev[::-1].copy()
