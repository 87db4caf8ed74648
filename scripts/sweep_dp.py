"""Sweep the Pallas DP kernel's (ITEM_TILE, UNROLL) on the real TPU.

Each variant runs in a subprocess (the constants are baked at import).
Usage: python scripts/sweep_dp.py            # run the sweep
       python scripts/sweep_dp.py one IT U   # single measurement (internal)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one() -> None:
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from blasr_tpu.ops.banded_align import AlignScores, make_qoff
    from blasr_tpu.ops.banded_pallas import ITEM_TILE, UNROLL, banded_align_pallas

    I, L, TP = 256, 1024, 256
    W = int(os.environ.get("BLASR_SWEEP_W", "128"))
    T = L + TP
    rng = np.random.default_rng(0)
    Q = rng.integers(0, 4, (I, L)).astype(np.uint8)
    Tc = rng.integers(0, 4, (I, T)).astype(np.uint8)
    # realistic: target contains a mutated copy of the query
    for i in range(I):
        c = Q[i].copy()
        mut = rng.random(L) < 0.12
        c[mut] = (c[mut] + 1) % 4
        Tc[i, TP // 2 : TP // 2 + L] = c
    Qd = jnp.asarray(Q)
    Td = jnp.asarray(Tc)
    qlen = jnp.full((I,), L, jnp.int32)
    tlo = jnp.zeros((I,), jnp.int32)
    thi = jnp.full((I,), T, jnp.int32)
    qoff = jnp.asarray(make_qoff(L, T, W, TP // 2))

    def step(tb: bool):
        return banded_align_pallas(
            Qd, qlen, Td, tlo, thi, qoff, None,
            scores=AlignScores(), with_traceback=tb, band_width=W,
        )

    r = step(True)
    np.asarray(r.score[:1])
    checks = int(np.asarray(r.score).sum())
    t0 = time.time()
    N = 10
    for _ in range(N):
        r = step(True)
    np.asarray(r.score[:1])
    ms = (time.time() - t0) / N * 1e3
    print(f"IT={ITEM_TILE} U={UNROLL}: {ms:.1f} ms (I={I}, scoresum={checks})",
          flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one()
        return
    variants = [(256, 2)]
    for it, u in variants:
        env = dict(os.environ)
        env["BLASR_DP_ITEM_TILE"] = str(it)
        env["BLASR_DP_UNROLL"] = str(u)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one"],
            env=env, cwd=REPO,
        )


if __name__ == "__main__":
    main()
