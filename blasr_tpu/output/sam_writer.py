"""SAM output (L6).

Role of reference ``printers/SAMPrinter.h`` (flag building :30-51, clipping
modes :59-102, CIGAR emission :120-260) and the header emission in main()
(Blasr.cpp:4628-4700). Soft and hard clipping supported; SEQ is emitted in
the orientation that matches the forward target (reverse-complemented when
FLAG 16 is set), as SAM requires.
"""

from __future__ import annotations

from typing import IO, Iterable, Optional, Sequence

import numpy as np

from blasr_tpu.core.encode import codes_to_seq, revcomp_codes
from blasr_tpu.io.batching import Read
from blasr_tpu.io.seqdb import SeqDB
from blasr_tpu.pipeline.runner import AlignmentRecord

FLAG_UNMAPPED = 4
FLAG_REVERSE = 16


def sam_header(seqdb: SeqDB, program_line: str = "blasr_tpu") -> list[str]:
    lines = ["@HD\tVN:1.5\tSO:unknown"]
    lines.extend(seqdb.sam_sq_lines())
    lines.append(f"@PG\tID:blasr_tpu\tPN:blasr_tpu\tCL:{program_line}")
    return lines


def _cigar_string(rec: AlignmentRecord, read_len: int, clipping: str) -> str:
    path = rec.path
    assert path is not None
    pre = path.q_start
    post = read_len - path.q_end
    # "subread" clips to the subread region (SAMPrinter.h:81-84); without
    # region tables (HDF5-only) the subread IS the whole read, so it
    # behaves as soft clipping here
    clip_op = "S" if clipping in ("soft", "subread") else "H"
    parts = []
    if pre and clipping != "none":
        parts.append(f"{pre}{clip_op}")
    parts.extend(f"{ln}{op}" for op, ln in path.cigar_runs())
    if post and clipping != "none":
        parts.append(f"{post}{clip_op}")
    return "".join(parts)


def format_sam_record(
    rec: AlignmentRecord,
    read: Read,
    clipping: str = "soft",
) -> str:
    n = len(read.codes)
    flag = FLAG_REVERSE if rec.tstrand else 0
    pos = rec.tstart_fwd + 1  # 1-based
    codes = read.codes if rec.tstrand == 0 else revcomp_codes(read.codes)
    qual = read.qual
    if qual is not None and rec.tstrand == 1:
        qual = qual[::-1]
    cigar = _cigar_string(rec, n, clipping)
    if clipping == "hard":
        p = rec.path
        codes = codes[p.q_start : p.q_end]
        if qual is not None:
            qual = qual[p.q_start : p.q_end]
    seq = codes_to_seq(codes)
    qual_s = (
        "*" if qual is None else (np.asarray(qual) + 33).astype(np.uint8).tobytes().decode()
    )
    tags = [
        f"RG:Z:default",
        f"AS:i:{rec.score}",
        f"NM:i:{rec.path.n_mismatch + rec.path.n_ins + rec.path.n_del}",
    ]
    fields = [
        rec.qname,
        str(flag),
        rec.tname,
        str(pos),
        str(rec.mapqv),
        cigar,
        "*",
        "0",
        "0",
        seq,
        qual_s,
    ] + tags
    return "\t".join(fields)


def format_unmapped(read: Read) -> str:
    qual_s = "*" if read.qual is None else (np.asarray(read.qual) + 33).astype(np.uint8).tobytes().decode()
    return "\t".join(
        [read.name, str(FLAG_UNMAPPED), "*", "0", "0", "*", "*", "0", "0",
         codes_to_seq(read.codes), qual_s]
    )


def write_sam(
    records: Iterable[AlignmentRecord],
    reads: Sequence[Read],
    seqdb: SeqDB,
    out: IO[str],
    clipping: str = "soft",
    program_line: str = "blasr_tpu",
    unmapped: Optional[Sequence[str]] = None,
) -> None:
    for line in sam_header(seqdb, program_line):
        out.write(line + "\n")
    by_name = {r.name: r for r in reads}
    for rec in records:
        rd = by_name.get(rec.qname)
        if rd is None:
            continue
        out.write(format_sam_record(rec, rd, clipping) + "\n")
    if unmapped:
        for name in unmapped:
            rd = by_name.get(name)
            if rd is not None:
                out.write(format_unmapped(rd) + "\n")
