"""Native C++ host kernels vs Python oracles."""

import numpy as np
import pytest

from blasr_tpu import native
from blasr_tpu.index.suffix_array import build_suffix_array_naive


@pytest.fixture(scope="module")
def rngn():
    return np.random.default_rng(7)


def test_native_available():
    assert native.available(), "native library must build in this image"


def test_sais_matches_naive(rngn):
    for n in (1, 2, 5, 33, 200, 999):
        c = rngn.integers(0, 5, n).astype(np.uint8)
        sa = native.sais(c)
        np.testing.assert_array_equal(sa, build_suffix_array_naive(c))


def test_sais_repetitive():
    for s in (b"abracadabra", b"aaaaaaaaaa", b"banana", b"mississippi" * 3):
        c = np.frombuffer(s, np.uint8).copy()
        np.testing.assert_array_equal(native.sais(c), build_suffix_array_naive(c))


def test_encode_strip():
    out = native.encode_strip(b"AC\nGT acgt\tNx\r\n")
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 0, 1, 2, 3, 4, 4])


def test_moves_to_cigar_and_unpack(rngn):
    from blasr_tpu.pipeline.traceback import AlignmentPath

    ops_fwd = rngn.integers(1, 4, 37).astype(np.uint8)
    # pack in END->START order, 2 bits per op
    rev = ops_fwd[::-1]
    packed = np.zeros((len(rev) + 3) // 4, np.uint8)
    for j, op in enumerate(rev):
        packed[j >> 2] |= op << (2 * (j & 3))
    np.testing.assert_array_equal(native.unpack_moves(packed, len(rev)), ops_fwd)
    co, cl = native.moves_to_cigar(packed, len(rev))
    # oracle RLE via AlignmentPath
    p = AlignmentPath(0, 0, 0, 0, ops_fwd, -1)
    runs = p.cigar_runs()
    chars = {1: "M", 2: "I", 3: "D"}
    assert [(chars[int(o)], int(l)) for o, l in zip(co, cl)] == runs


def test_xeq_cigar_matches_numpy(rngn):
    """Native one-pass =/X CIGAR equals the numpy _xeq_runs construction
    over random op strings, all clip modes."""
    from blasr_tpu.output.sam_writer import _xeq_runs

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    for trial in range(20):
        n = int(rngn.integers(1, 300))
        ops = rngn.integers(1, 4, n).astype(np.uint8)
        nq = int((ops != 3).sum())
        nt = int((ops != 2).sum())
        q0, t0 = int(rngn.integers(0, 5)), int(rngn.integers(0, 5))
        q = rngn.integers(0, 4, nq + q0 + 4).astype(np.uint8)
        t = rngn.integers(0, 4, nt + t0 + 4).astype(np.uint8)
        pre, post = int(rngn.integers(0, 9)), int(rngn.integers(0, 9))
        for clip_op in ("S", "H"):
            runs = _xeq_runs(ops, q, t, q0, t0)
            expect = "".join(
                ([f"{pre}{clip_op}"] if pre else [])
                + [f"{ln}{op}" for ln, op in runs]
                + ([f"{post}{clip_op}"] if post else [])
            )
            got = native.xeq_cigar(ops, q, t, q0, t0, pre, post, clip_op)
            assert got == expect, (trial, clip_op)
