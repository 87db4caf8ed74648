"""Microbench: row gather x[rows] vs one-hot matmul on the real TPU.

Row selection (64 or 128 rows out of 128) appears at several pipeline
points (qitems, moves_dense[sel_item], anchor arrays at [row]). On TPU a
one-hot f32 matmul can beat a gather for small row counts.

Run: python scripts/micro_rowgather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")

    def bench_one(name, fn, pick, N=100):
        r = fn()
        np.asarray(pick(r))
        t0 = time.time()
        for _ in range(N):
            r = fn()
        np.asarray(pick(r))
        print(f"  {name}: {(time.time()-t0)/N*1e3:.2f} ms")

    for (NR, NC, NS) in [(128, 4610, 64), (128, 1024, 128), (128, 512, 128)]:
        x = jnp.asarray(rng.integers(0, 255, (NR, NC)).astype(np.uint8))
        rows = jnp.asarray(rng.integers(0, NR, (NS,)).astype(np.int32))

        @jax.jit
        def g(x, rows):
            return x[rows]

        @jax.jit
        def m(x, rows):
            oh = (rows[:, None] == jnp.arange(NR)[None, :]).astype(jnp.float32)
            return jnp.dot(oh, x.astype(jnp.float32)).astype(jnp.uint8)

        a = np.asarray(g(x, rows)); b = np.asarray(m(x, rows))
        assert (a == b).all()
        bench_one(f"gather {NR}x{NC}->{NS}", lambda: g(x, rows), lambda r: r[:1, :1])
        bench_one(f"matmul {NR}x{NC}->{NS}", lambda: m(x, rows), lambda r: r[:1, :1])


if __name__ == "__main__":
    main()
