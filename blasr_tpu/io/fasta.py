"""FASTA reading/writing (L1).

Role of reference ``common/FASTAReader.h`` (buffered parse,
``ReadAllSequencesIntoOne`` used at Blasr.cpp:4316-4338), re-designed as a
whole-file vectorized numpy parse: one read of the file, newline split, and
bulk concatenation — no per-character loop.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

from blasr_tpu.core.encode import codes_to_seq, seq_to_codes


def read_fasta(path: str) -> list[tuple[str, np.ndarray]]:
    """Parse FASTA -> list of (name, codes uint8[n]).

    Name is the first whitespace-delimited token of the title line
    (matching reference FASTASequence::GetName()).
    """
    with open(path, "rb") as f:
        data = f.read()
    records: list[tuple[str, np.ndarray]] = []
    name: str | None = None
    chunks: list[bytes] = []
    for line in data.split(b"\n"):
        line = line.strip()
        if not line:
            continue
        if line.startswith(b">"):
            if name is not None:
                records.append((name, seq_to_codes(b"".join(chunks))))
            name = line[1:].split()[0].decode("ascii") if len(line) > 1 else ""
            chunks = []
        else:
            chunks.append(line)
    if name is not None:
        records.append((name, seq_to_codes(b"".join(chunks))))
    return records


def write_fasta(path: str, records: list[tuple[str, np.ndarray]], width: int = 70) -> None:
    with open(path, "w") as f:
        for name, codes in records:
            f.write(f">{name}\n")
            s = codes_to_seq(codes)
            for i in range(0, len(s), width):
                f.write(s[i : i + width] + "\n")


def iter_fasta(path: str) -> Iterator[tuple[str, np.ndarray]]:
    yield from read_fasta(path)


def md5_of_codes(codes: np.ndarray) -> str:
    """MD5 of the uppercase ASCII sequence (for SAM @SQ M5 tags; role of
    reference FASTAReader computeMD5 / MakeMD5 in common/utils.h)."""
    return hashlib.md5(codes_to_seq(codes).encode("ascii")).hexdigest()
