"""-m 4 interval output (L6).

Role of reference ``printers/IntervalAlignmentPrinter.h`` — the
machine-parsable 13-column format:

qname tname score pctsimilarity qstrand qstart qend qseqlength tstrand
tstart tend tseqlength mapqv
"""

from __future__ import annotations

from typing import IO, Iterable

from blasr_tpu.pipeline.runner import AlignmentRecord

HEADER = (
    "qname tname score pctsimilarity qstrand qstart qend qseqlength "
    "tstrand tstart tend tseqlength mapqv"
)


def format_m4(rec: AlignmentRecord) -> str:
    return (
        f"{rec.qname} {rec.tname} {rec.score} {rec.pct_similarity:.4f} "
        f"{rec.qstrand} {rec.qstart} {rec.qend} {rec.qlength} "
        f"{rec.tstrand} {rec.tstart} {rec.tend} {rec.tlength} {rec.mapqv}"
    )


def write_m4(records: Iterable[AlignmentRecord], out: IO[str], header: bool = False) -> None:
    if header:
        out.write(HEADER + "\n")
    for rec in records:
        out.write(format_m4(rec) + "\n")
