"""On-device traceback walk over stored arrow bytes (L4).

The reference recovers paths with an in-DP pointer walk on the host CPU
(e.g. KBandAlign.h traceback loop). On TPU the arrow tensor produced by the
wavefront DP (ops/banded_align.py) lives in HBM and is far too large to ship
to the host (the host link is the slowest resource in the system), so the
walk runs on device as a ``lax.while_loop`` vectorized across all alignments
of a batch; only a 2-bit-packed move string (~1% of the arrow bytes) plus
scalar stats leave the chip.

The walk is a serial pointer chase — per sub-step cost is dominated by the
one random HBM gather into the arrow tensor. Everything else is engineered
away: the band-offset schedule is evaluated in closed form
(qoff(a) = clip((a - diag) >> 1 - W/2, 0, L - W), see
banded_align.make_qoff) instead of two table gathers, and emitted ops are
stored DENSELY at the loop-step column (one contiguous column write) instead
of scattering at per-row ragged offsets; winner rows are compacted once
after the loop.

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

WALK_UNROLL = 8  # sub-steps per while iteration (amortizes cond overhead)


class DeviceTraceback(NamedTuple):
    """Compact per-alignment traceback (device arrays, host-transfer ready).

    moves_dense holds one op slot per WALK SUB-STEP in END->START order
    (OP_NONE where a sub-step emitted nothing); ``pack_moves_rows`` compacts
    selected rows to the 2-bit wire format. Spans are half-open local window
    coordinates like AlignmentPath.
    """

    moves_dense: jax.Array  # (I, SD) uint8 per-substep ops, END->START
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


@functools.partial(jax.jit, static_argnames=("qoff_params",))
def walk_arrows_device(
    arrows: jax.Array,   # (S, IA, W) uint8
    qoff: jax.Array,     # (S,) int32
    best_a: jax.Array,   # (I,) int32
    best_w: jax.Array,   # (I,) int32
    scores: jax.Array,   # (I,) int32 (< 0 where an alignment exists)
    query: jax.Array,    # (I, L) uint8
    target: jax.Array,   # (I, T) uint8
    item_idx: jax.Array | None = None,  # (I,) int32 column of each walk in arrows
    qoff_params: tuple[int, int, int] | None = None,  # (diag, W_band, L_q)
) -> DeviceTraceback:
    """Walk I paths through an (S, IA, W) arrow tensor.

    item_idx maps walk i -> arrow column (IA >= I), so a walk over a
    selected subset reads the full-candidate arrow tensor in place.
    qoff_params, when given, must describe the make_qoff schedule that
    produced ``qoff`` — the walk then computes band offsets analytically
    (two fewer gathers per serial step).
    """
    S, IA, W = arrows.shape
    I = best_a.shape[0]
    L = query.shape[1]
    T = target.shape[1]
    rows = jnp.arange(I, dtype=jnp.int32)           # walk-local row index
    ii = rows if item_idx is None else item_idx.astype(jnp.int32)  # arrow column
    flat = arrows.reshape(-1)

    if qoff_params is not None:
        diag, Wb, Lq = qoff_params
        hi = max(0, Lq - Wb)

        def qoff_at(a):
            # floor-div of possibly-negative (a - diag); jnp // floors
            return jnp.clip((a - diag) // 2 - Wb // 2, 0, hi).astype(jnp.int32)

        def s1_at(a):
            return qoff_at(a) - qoff_at(a - 1)
    else:
        s1_tab = jnp.diff(qoff, prepend=qoff[:1]).astype(jnp.int32)  # (S,)

        def qoff_at(a):
            return qoff[jnp.clip(a, 0, S - 1)]

        def s1_at(a):
            return s1_tab[jnp.clip(a, 0, S - 1)]

    max_iter = 2 * S + 4
    NIT = -(-max_iter // WALK_UNROLL)
    SD = NIT * WALK_UNROLL                          # dense move columns

    def cond(carry):
        a, w, st, active, nops, moves, it = carry
        return jnp.any(active) & (it < NIT)

    def substep(a, w, st, active, nops, byte_pos):
        ac = jnp.clip(a, 0, S - 1)
        wc = jnp.clip(w, 0, W - 1)
        byte = flat[(ac * IA + ii) * W + wc].astype(jnp.int32)
        src = byte & 7
        ebit = (byte >> 3) & 1
        fbit = (byte >> 4) & 1
        cs1 = s1_at(ac)
        cs2 = s1_at(jnp.clip(ac - 1, 0, S - 1))

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

        emit = jnp.where(active, emit, jnp.uint8(OP_NONE))
        nops = nops + (emit > 0).astype(jnp.int32)
        a = jnp.where(active, a + da, a)
        w = jnp.where(active, w + dw, w)
        st = jnp.where(active, new_st, st)
        active = active & ~stop & (a >= 0) & (w >= 0) & (w < W)
        return a, w, st, active, nops, emit

    def body(carry):
        a, w, st, active, nops, moves, it = carry
        emits = []
        for _ in range(WALK_UNROLL):
            a, w, st, active, nops, emit = substep(a, w, st, active, nops, None)
            emits.append(emit)
        block = jnp.stack(emits, axis=1)            # (I, U)
        moves = jax.lax.dynamic_update_slice(
            moves, block, (jnp.int32(0), it * WALK_UNROLL)
        )
        return a, w, st, active, nops, moves, it + 1

    init = (
        best_a.astype(jnp.int32),
        best_w.astype(jnp.int32),
        jnp.zeros(I, jnp.int32),
        scores < 0,
        jnp.zeros(I, jnp.int32),
        jnp.zeros((I, SD), jnp.uint8),
        jnp.int32(0),
    )
    _, _, _, _, nops, moves, _ = jax.lax.while_loop(cond, body, init)

    # ---- stats (vectorized over the dense move slots; END->START order;
    # OP_NONE slots contribute nothing to any cumsum/count) ----
    mv = moves
    n_ins = jnp.sum(mv == OP_I, axis=1).astype(jnp.int32)
    n_del = jnp.sum(mv == OP_D, axis=1).astype(jnp.int32)
    n_mops = jnp.sum(mv == OP_M, axis=1).astype(jnp.int32)

    q_end = qoff_at(jnp.clip(best_a, 0, S - 1)) + best_w + 1
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

    return DeviceTraceback(
        moves_dense=moves,
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


@functools.partial(jax.jit, static_argnames=("out_width",))
def pack_moves_rows(moves_dense: jax.Array, out_width: int) -> jax.Array:
    """Compact (I2, SD) dense END->START op slots (OP_NONE holes) into the
    2-bit wire format (I2, out_width) — run on the SELECTED rows only.

    Stable argsort on the hole mask preserves op order while pushing holes
    to the back; ops then 2-bit pack 4/byte.
    """
    I2, SD = moves_dense.shape
    holes = (moves_dense == OP_NONE).astype(jnp.int32)
    order = jnp.argsort(holes, axis=1, stable=True)
    compact = jnp.take_along_axis(moves_dense, order, axis=1)
    S2 = 4 * out_width
    if SD >= S2:
        compact = compact[:, :S2]
    else:
        compact = jnp.pad(compact, ((0, 0), (0, S2 - SD)))
    mvp = compact.reshape(I2, out_width, 4).astype(jnp.int32)
    shifts = jnp.array([0, 2, 4, 6], jnp.int32)
    return jnp.sum(mvp << shifts[None, None, :], axis=2).astype(jnp.uint8)


def unpack_moves(packed_row: np.ndarray, nops: int) -> np.ndarray:
    """Host-side: unpack one move string to START->END op order (uint8)."""
    from blasr_tpu import native

    out = native.unpack_moves(packed_row, nops)
    if out is not None:
        return out
    b = packed_row[:, None] >> np.array([0, 2, 4, 6], np.uint8)[None, :]
    ops_rev = (b & 3).reshape(-1)[:nops]
    return ops_rev[::-1].copy()
