"""Prototype: per-item DMA span/row gather vs XLA random gather.

The pipeline's contiguous-span fetches (genome window words, query-row
words, anchor rows) run as XLA per-element random gathers at a measured
23-45 M elem/s (micro_anchors.py). Each fetch is a CONTIGUOUS span of an
HBM array, so a Pallas kernel that issues one pipelined DMA per item
should be latency-bound on the copy issue, not per-element.

Mosaic constraint: HBM slices must respect the (.., 128)-lane tiling —
a 1D arbitrary-offset slice is rejected ("must be aligned to tiling
(1024)"). So the source is viewed as (N/128, 128) and each item fetches
ceil(span/128)+1 WHOLE rows (row index = start >> 7, always legal),
then a per-row roll (log2 conditional pltpu.rolls) aligns the start
phase in VMEM — same bit-trick as banded_pallas._roll_item.

Run: python scripts/micro_dma.py            # TPU timing
     python scripts/micro_dma.py interpret  # CPU correctness only
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LANES = 128


def _build(span: int, IT: int, NR: int, NSEM: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = NR * LANES

    def kernel(w0_ref, src_ref, w0v_ref, out_ref):
        i0 = pl.program_id(0) * IT   # (outside run_scoped: interpret-mode
                                     # discharge loses the grid context)

        def run(scratch, sems):

            def mk(r, slot):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(w0_ref[i0 + r] // LANES, NR), :],
                    scratch.at[r],
                    sems.at[slot],
                )

            def body(r, _):
                @pl.when(r >= NSEM)
                def _():
                    mk(r - NSEM, (r - NSEM) % NSEM).wait()
                mk(r, r % NSEM).start()
                return 0

            jax.lax.fori_loop(0, IT, body, 0)

            def tail(j, _):
                r = IT - NSEM + j
                @pl.when(r >= 0)
                def _():
                    mk(r, r % NSEM).wait()
                return 0

            jax.lax.fori_loop(0, NSEM, tail, 0)

            # phase-align: per-row LEFT rotate by w0 % LANES
            x = scratch[:].reshape(IT, W)
            off = w0v_ref[:] % LANES              # (IT, 1)
            b = 1
            while b < W:
                bit = (off & b) != 0
                x = jnp.where(bit, pltpu.roll(x, shift=W - b, axis=1), x)
                b <<= 1
            out_ref[:] = x[:, :span]

        pl.run_scoped(
            run,
            pltpu.VMEM((IT, NR, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        )

    def call(src2d, w0, I):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(I // IT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((IT, 1), lambda i, w0: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (IT, span), lambda i, w0: (i, 0), memory_space=pltpu.VMEM
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((I, span), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(w0, src2d, w0[:, None])

    return call


@functools.partial(
    __import__("jax").jit, static_argnames=("span", "interpret")
)
def dma_span_gather(src, starts, *, span: int, interpret: bool = False):
    """out[i, :] = src[starts[i] : starts[i] + span] via row DMAs.

    src: (N,) int32, N a multiple of 128; starts caller-clipped to
    [0, N - span - 128].
    """
    import jax.numpy as jnp

    I = starts.shape[0]
    NR = -(-span // LANES) + 1
    IT = min(256, I)
    call = _build(span, IT, NR, NSEM=8, interpret=interpret)
    src2d = src.reshape(-1, LANES)
    return call(src2d, starts.astype(jnp.int32), I)


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    import jax
    import jax.numpy as jnp

    if interpret:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    N = 600_064
    I, S = 512, 162
    src = jnp.asarray(rng.integers(0, 2**31 - 1, N).astype(np.int32))
    starts = jnp.asarray(
        rng.integers(0, N - S - LANES, I).astype(np.int32))

    out = dma_span_gather(src, starts, span=S, interpret=interpret)
    ref = np.asarray(src)[
        np.asarray(starts)[:, None] + np.arange(S)[None, :]
    ]
    ok = np.array_equal(np.asarray(out), ref)
    print(f"correct: {ok}", flush=True)
    if not ok:
        bad = np.nonzero(
            np.any(np.asarray(out) != ref, axis=1))[0][:4]
        print("first bad rows:", bad, flush=True)
        return
    if interpret:
        return

    R = 20

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
        print(f"  {name:<34} {dt:6.3f} ms/iter", flush=True)

    def f_xla(salt, src, starts):
        widx = (starts + salt)[:, None] + jnp.arange(
            S, dtype=jnp.int32)[None, :]
        return src[jnp.clip(widx, 0, N - 1)]
    timed(f"XLA gather ({I} x {S})", f_xla, src, starts)

    def f_dma(salt, src, starts):
        return dma_span_gather(src, starts + salt, span=S)
    timed(f"DMA span gather ({I} x {S})", f_dma, src, starts)

    # wider span (the 3328-cap shape)
    S2 = 482
    starts2 = jnp.asarray(
        rng.integers(0, N - S2 - LANES, I).astype(np.int32))

    def f_xla2(salt, src, starts2):
        widx = (starts2 + salt)[:, None] + jnp.arange(
            S2, dtype=jnp.int32)[None, :]
        return src[jnp.clip(widx, 0, N - 1)]
    timed(f"XLA gather ({I} x {S2})", f_xla2, src, starts2)

    def f_dma2(salt, src, starts2):
        return dma_span_gather(src, starts2 + salt, span=S2)
    timed(f"DMA span gather ({I} x {S2})", f_dma2, src, starts2)


if __name__ == "__main__":
    main()
