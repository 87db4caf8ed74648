"""Write a binary alchemy output model at published PacBio CLR rates.

The reference's simulator (``/root/reference/simulator/Alchemy.cpp``) draws
per-context emission samples from an ``OutputSampleListSet`` binary file
(format defined by its Write/Read pair, OutputSampleListSet.h:32-86,
OutputSample.h:32-45, QualitySample.h:33-38, OutputSampleList.h:11-32):

  int32 setSize, int32 keyLength
  per key: keyLength ASCII bytes, int32 nElem, nElem x OutputSample:
      int32 type (0 Match, 1 Insertion, 2 Deletion, 3 Substitution, 4 Merge)
      int32 nNuc
      if type != Deletion: nNuc x (5 u8 QVs, 3 u16 frames, 2 u8 tags)
                           then nNuc ASCII nucleotides
  int32 numLengths, numLengths x int32 (alignment-length histogram, used
  as the -lengthModel source, Alchemy.cpp:216)

This generator fills every 4^k context with samples at the BLASR paper's
CLR rates (~11% insertion / 3.4% deletion / 1.4% substitution — the same
published numbers scripts/independent_validation.py uses), giving the
reference's own simulator an error model that our code did not fit. The
point of the exercise (VERDICT round-3 item 9) is that the read GENERATION
machinery — context sampling, emission replay, length model — is the
reference's, not ours.

Usage: python scripts/make_alchemy_model.py /tmp/clr.model [key_len]
"""

from __future__ import annotations

import struct
import sys

import numpy as np

INS_RATE = 0.110
DEL_RATE = 0.034
SUB_RATE = 0.014
N_PER_KEY = 1000  # samples per context (counts encode the rates)


def qsample(qv: int) -> bytes:
    """One QualitySample: 5 QVs, 3 uint16 frame values, 2 nucleotide tags."""
    return struct.pack(
        "<5B3H2B", qv, qv, qv, qv, qv, 1, 10, 10, ord("A"), ord("A")
    )


def sample_bytes(stype: int, nucs: bytes, qv: int = 10) -> bytes:
    out = struct.pack("<ii", stype, len(nucs) if stype != 2 else 1)
    if stype != 2:  # Deletion carries no nucleotides/qualities
        out += b"".join(qsample(qv) for _ in nucs)
        out += nucs
    return out


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clr.model"
    key_len = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = np.random.default_rng(20260820)
    bases = b"ACGT"
    n_keys = 4 ** key_len
    mid = key_len // 2

    n_ins = round(N_PER_KEY * INS_RATE)
    n_del = round(N_PER_KEY * DEL_RATE)
    n_sub = round(N_PER_KEY * SUB_RATE)
    n_match = N_PER_KEY - n_ins - n_del - n_sub

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", n_keys, key_len))
        for ki in range(n_keys):
            key = bytes(
                bases[(ki >> (2 * (key_len - 1 - j))) & 3]
                for j in range(key_len)
            )
            m = key[mid : mid + 1]
            recs = []
            recs.append((n_match, sample_bytes(0, m)))
            # cognate-biased insertion: the read shows the base twice more
            # often than a random extra base (BLASR paper's dominant CLR
            # insertion mode)
            n_cog = n_ins * 2 // 3
            recs.append((n_cog, sample_bytes(1, m + m)))
            other = bases[int(rng.integers(0, 4))]
            recs.append((n_ins - n_cog, sample_bytes(1, m + bytes([other]))))
            recs.append((n_del, sample_bytes(2, b"")))
            subs = [b for b in bases if b != m[0]]
            recs.append(
                (n_sub, sample_bytes(3, bytes([subs[int(rng.integers(0, 3))]])))
            )
            total = sum(n for n, _ in recs)
            f.write(key)
            f.write(struct.pack("<i", total))
            for n, rec in recs:
                f.write(rec * n)
        # alignment-length histogram -> -lengthModel source: lognormal CLR
        # lengths, mean ~1 kb, clipped to [500, 3200]
        lens = np.clip(
            rng.lognormal(mean=6.85, sigma=0.35, size=4000), 500, 3200
        ).astype(np.int32)
        lens.sort()
        f.write(struct.pack("<i", len(lens)))
        f.write(lens.tobytes())
    print(f"wrote {path}: {n_keys} keys x {N_PER_KEY} samples, "
          f"{len(lens)} lengths")


if __name__ == "__main__":
    main()
