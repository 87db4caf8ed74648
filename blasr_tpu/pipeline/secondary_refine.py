"""Reference-faithful secondary-record admission (the -bestn tail).

Role of the reference's pre-refine RemoveLowQualityAlignments cut
(Blasr.cpp:1994-2090 path: AlignIntervals scores each candidate interval by
its detailed-SDP block chain + ComputeAlignmentStats gap rendering,
AlignmentUtils.h:536; records sorted by that score are truncated at the
first score > -maxScore). A secondary interval whose seed chain supports
only part of the read scores far above -maxScore there — the reference
never emits it — while this pipeline's full-window LOCAL DP finds a
genuine low-identity path over the whole window and would.

Instead of re-running SDP on host, the DP path itself supplies the block
chain: the reference's SDP blocks are exact sdpTupleSize-mers on the
optimal chain, and every exact >= sdpTupleSize match run on our DP path is
such a block (conversely, mushy low-identity stretches carry almost no
exact 11-runs: P ~ id^11). Scoring follows CreateAlignmentStrings'
between-block gap rendering exactly (AlignmentUtils.h:466-533): the common
part of a (qgap, tgap) pair renders as aligned columns over the LAST
common bases of each gap, the remainder as pure indels.

Local semantics: the chain spans first block -> last block; unaligned
prefix/suffix of the path is NOT penalized (SDPAlign is called with
Local, Blasr.cpp:1716-1721, and extendAlignments defaults false).
"""

from __future__ import annotations

import numpy as np

OP_M, OP_I, OP_D = 1, 2, 3


def sdp_block_score(
    q_codes: np.ndarray,   # (Lq,) uint8 query codes in WALKED orientation
    t_codes: np.ndarray,   # (Lt,) uint8 target codes (forward genome slice)
    ops: np.ndarray,       # path ops (OP_M/I/D) start->end, walked coords
    q_start: int,          # path start within q_codes
    t_start: int,          # path start within t_codes
    *,
    match: int = -5,
    mismatch: int = 6,
    n_score: int = 0,
    ins: int = 5,          # query-gap (insertion) cost, -indel
    dele: int = 5,         # target-gap (deletion) cost, -deletion
    min_run: int = 11,     # sdpTupleSize (MappingParameters.h default 11)
) -> int:
    """Block-chain score of a DP path under the reference's SDP-stats
    semantics. Returns 0 (empty) when the path carries no exact match run
    of at least ``min_run`` bases."""
    ops = np.asarray(ops)
    if ops.size == 0:
        return 0
    is_q = (ops == OP_M) | (ops == OP_I)
    is_t = (ops == OP_M) | (ops == OP_D)
    qi = q_start + np.cumsum(is_q) - is_q
    ti = t_start + np.cumsum(is_t) - is_t
    m_cols = ops == OP_M
    qm = q_codes[qi[m_cols]]
    tm = t_codes[ti[m_cols]]
    exact = (qm == tm) & (qm < 4)

    # maximal exact runs along the path: a run breaks on a mismatch column
    # or any indel column between M columns
    col_of_m = np.flatnonzero(m_cols)
    # break before an M column if the previous path column is not an
    # adjacent exact M column
    prev_adj = np.zeros(exact.shape, bool)
    if exact.size > 1:
        prev_adj[1:] = exact[:-1] & (np.diff(col_of_m) == 1)
    run_start = exact & ~prev_adj
    run_id = np.cumsum(run_start) - 1
    run_len = np.zeros(int(run_id[-1]) + 1 if exact.any() else 0, np.int64)
    if exact.any():
        np.add.at(run_len, run_id[exact], 1)
    keep = np.flatnonzero(run_len >= min_run)
    if keep.size == 0:
        return 0
    starts_m = np.flatnonzero(run_start)          # index into M columns
    bq = qi[col_of_m[starts_m[keep]]]             # block q starts
    bt = ti[col_of_m[starts_m[keep]]]
    bl = run_len[keep]

    score = int(match) * int(bl.sum())
    for j in range(len(keep) - 1):
        qgap = int(bq[j + 1] - (bq[j] + bl[j]))
        tgap = int(bt[j + 1] - (bt[j] + bl[j]))
        common = min(qgap, tgap)
        # the two gap directions carry their own costs (reference
        # ComputeAlignmentStats scores -indel and -deletion separately)
        score += ins * (qgap - common) + dele * (tgap - common)
        if common > 0:
            qc = q_codes[bq[j + 1] - common : bq[j + 1]]
            tc = t_codes[bt[j + 1] - common : bt[j + 1]]
            eq = (qc == tc) & (qc < 4)
            anyn = (qc >= 4) | (tc >= 4)
            score += int(
                np.where(eq, match, np.where(anyn, n_score, mismatch)).sum()
            )
    return score


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of 0..4 codes (4 = N maps to itself)."""
    comp = np.array([3, 2, 1, 0, 4], np.uint8)
    return comp[codes[::-1]]
