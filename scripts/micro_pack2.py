"""Compare pack_query_kmers variants at the bench shape (scan-amortized).

Current: k strided slices over (2B, L/ST). Variant B: full unstrided
pack (k unaligned contiguous slices over (2B, L)) + one strided slice of
the packed result. Bit-equal (validated in-process here before timing).

Run: python scripts/micro_pack2.py [R]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pack_full_then_stride(codes, lengths, k, stride):
    import jax.numpy as jnp

    B, L = codes.shape
    st = max(1, stride)
    Ls = -(-L // st)
    ext = jnp.pad(
        codes.astype(jnp.int32), ((0, 0), (0, k + st)), constant_values=4)
    acc = jnp.zeros((B, L), jnp.int32)
    bad = jnp.zeros((B, L), bool)
    for j in range(k):
        w = ext[:, j : j + L]
        acc = (acc << 2) | (w & 3)
        bad = bad | (w >= 4)
    acc = acc[:, ::st][:, :Ls]
    bad = bad[:, ::st][:, :Ls]
    pos = jnp.arange(Ls, dtype=jnp.int32)[None, :] * st
    bad = bad | (pos + k > lengths[:, None])
    return jnp.where(bad, jnp.int32(-1), acc)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    from blasr_tpu.ops.anchors import pack_query_kmers

    rng = np.random.default_rng(0)
    B2, L, k, ST = 512, 1024, 14, 4
    codes = rng.integers(0, 5, (B2, L)).astype(np.uint8)
    lengths = rng.integers(500, L, B2).astype(np.int32)
    cd = jnp.asarray(codes)
    ld = jnp.asarray(lengths)

    a = np.asarray(pack_query_kmers(cd, ld, k, ST))
    b = np.asarray(pack_full_then_stride(cd, ld, k, ST))
    assert np.array_equal(a, b), "variant B not bit-equal"
    print(f"backend={jax.default_backend()} equal: True", flush=True)

    def timed(name, fn, *args):
        def outer(*a):
            def body(carry, _):
                out = fn(carry & 1, *a)
                return carry + out.reshape(-1)[0].astype(jnp.int32), None
            return jax.lax.scan(body, jnp.int32(0), None, length=R)[0]

        run = jax.jit(outer)
        r = run(*args)
        np.asarray(r)
        t0 = time.time()
        r = run(*args)
        np.asarray(r)
        dt = (time.time() - t0) / R * 1e3
        print(f"  {name:<28} {dt:6.3f} ms/iter", flush=True)

    timed("strided pack (current)",
          lambda s, c: pack_query_kmers(
              c + s.astype(jnp.uint8), ld, k, ST).astype(jnp.int32), cd)
    timed("full-then-stride (B)",
          lambda s, c: pack_full_then_stride(
              c + s.astype(jnp.uint8), ld, k, ST).astype(jnp.int32), cd)


if __name__ == "__main__":
    main()
