"""Read simulator (L8 satellite: role of reference ``simulator/alchemy`` +
``sequtils/Evolve.cpp`` + ``simpleShredder``).

Generates synthetic genomes and PacBio-like noisy reads with known true
positions encoded in the read title (the reference's ``-posMap``/title
convention ``>read_index|chr|start|end``), so mapping accuracy can be scored
without real data.
"""

from __future__ import annotations

import numpy as np

from blasr_tpu.core.encode import revcomp_codes
from blasr_tpu.io.batching import Read


def simulate_genome(length: int, seed: int = 0, repeat_fraction: float = 0.05) -> np.ndarray:
    """Random genome with a sprinkling of duplicated blocks (repeats)."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, length).astype(np.uint8)
    n_rep = int(length * repeat_fraction) // 2000
    for _ in range(max(0, n_rep)):
        src = int(rng.integers(0, length - 2000))
        dst = int(rng.integers(0, length - 2000))
        g[dst : dst + 2000] = g[src : src + 2000]
    return g


def simulate_reads(
    genome: np.ndarray,
    n_reads: int,
    mean_len: int = 1000,
    min_len: int = 200,
    seed: int = 1,
    sub_rate: float = 0.01,
    ins_rate: float = 0.08,
    del_rate: float = 0.04,
) -> tuple[list[Read], list[tuple[int, int, int]]]:
    """Sample noisy reads; returns (reads, truth=(start, end, strand))."""
    rng = np.random.default_rng(seed)
    G = len(genome)
    reads: list[Read] = []
    truth: list[tuple[int, int, int]] = []
    for i in range(n_reads):
        length = int(np.clip(rng.exponential(mean_len * 0.35) + mean_len * 0.65, min_len, mean_len * 3))
        length = min(length, G - 1)
        start = int(rng.integers(0, G - length))
        end = start + length
        # sample errors vectorized: per-position event
        seg = genome[start:end]
        r = rng.random(length)
        keep = r >= del_rate
        seg = seg[keep]
        r2 = rng.random(len(seg))
        subs = r2 < sub_rate
        seg = np.where(subs, (seg + rng.integers(1, 4, len(seg))) % 4, seg).astype(np.uint8)
        n_ins = rng.binomial(len(seg), ins_rate)
        if n_ins:
            pos = np.sort(rng.integers(0, len(seg) + 1, n_ins))
            ins = rng.integers(0, 4, n_ins).astype(np.uint8)
            seg = np.insert(seg, pos, ins)
        strand = int(rng.integers(0, 2))
        if strand:
            seg = revcomp_codes(seg)
        name = f"sim/{i}|ref|{start}|{end}|{strand}"
        reads.append(Read(name, seg, None, i))
        truth.append((start, end, strand))
    return reads, truth


def parse_truth(name: str) -> tuple[int, int, int]:
    """Decode (start, end, strand) from a simulated read title."""
    parts = name.split("|")
    return int(parts[2]), int(parts[3]), int(parts[4])


def shred_genome(
    genome: np.ndarray,
    seqdb,
    read_length: int,
    coverage: float = 1.0,
    seed: int = 0,
) -> list[tuple[str, np.ndarray]]:
    """Shred a genome into error-free reads (role of sequtils simpleShredder).

    Tiles each contig with reads of ``read_length``; coverage > 1 adds
    additional randomly-offset passes.
    """
    rng = np.random.default_rng(seed)
    out: list[tuple[str, np.ndarray]] = []
    starts = seqdb.starts
    idx = 0
    n_pass = max(1, int(np.ceil(coverage)))
    for ci, name in enumerate(seqdb.names):
        lo, hi = int(starts[ci]), int(starts[ci + 1])
        for p in range(n_pass):
            ofs = 0 if p == 0 else int(rng.integers(0, read_length))
            for s in range(lo + ofs, hi, read_length):
                e = min(s + read_length, hi)
                if e - s < read_length // 4:
                    continue
                out.append((f"shred/{idx}|{name}|{s - lo}|{e - lo}|0",
                            genome[s:e].copy()))
                idx += 1
    return out


def evolve_sequence(
    codes: np.ndarray,
    sub_rate: float,
    ins_rate: float,
    del_rate: float,
    seed: int = 0,
) -> tuple[np.ndarray, dict]:
    """Mutate a sequence (role of sequtils/Evolve.cpp): substitutions,
    insertions and deletions at the given per-base rates. Returns the
    mutated sequence and mutation counts."""
    rng = np.random.default_rng(seed)
    n = len(codes)
    r = rng.random(n)
    keep = r >= del_rate
    seg = codes[keep]
    r2 = rng.random(len(seg))
    subs = (r2 < sub_rate) & (seg < 4)
    seg = np.where(
        subs, (seg + rng.integers(1, 4, len(seg))) % 4, seg
    ).astype(np.uint8)
    n_ins = rng.binomial(len(seg), ins_rate)
    if n_ins:
        pos = np.sort(rng.integers(0, len(seg) + 1, n_ins))
        ins = rng.integers(0, 4, n_ins).astype(np.uint8)
        seg = np.insert(seg, pos, ins)
    stats = {
        "n_sub": int(subs.sum()),
        "n_del": int(n - keep.sum()),
        "n_ins": int(n_ins),
    }
    return seg, stats
