"""Per-item DMA gathers for contiguous-span fetches (TPU).

XLA lowers random gathers on TPU to per-ELEMENT fetches — measured
23-45 M elem/s on v5e (scripts/micro_anchors.py) — so every (I, S) window
fetch costs milliseconds even though each item reads a CONTIGUOUS span.
These kernels issue ONE pipelined DMA per item instead (the copy engine
moves the whole span), making the fetch issue-latency-bound (~2 us/item):
measured 3.7 -> 1.2 ms for the (512 x 482) genome-window shape
(scripts/micro_dma.py).

Mosaic constraint: HBM slices must respect lane tiling — an arbitrary-
offset 1D slice is rejected ("must be aligned to tiling (1024)"). So
``gather_spans`` views the source as (N/128, 128), fetches whole ROWS
(row index = start >> 7, always legal), and phase-aligns with per-row
conditional rolls in VMEM (same bit trick as banded_pallas._roll_item —
7 rolls, since the phase is < 128). ``gather_rows`` fetches whole rows of
a 2D source directly (no roll).

Role in the reference: these serve the target/query buffer preparation of
AlignIntervals (Blasr.cpp:1286-1305 fetching tAlignedSeq windows) — there
a pointer into the contiguous genome, here an explicit HBM->VMEM copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NSEM = 8


@functools.partial(jax.jit, static_argnames=("span", "interpret"))
def gather_spans(
    src: jax.Array,      # (N,) int32, N % 128 == 0
    starts: jax.Array,   # (I,) int32; clipped here to [0, N - NR*128] —
                         # the caller must ensure clipped windows are
                         # semantically dead (read all-padding)
    *,
    span: int,
    interpret: bool = False,
) -> jax.Array:          # (I, span): out[i, :] = src[starts[i]:+span]
    I0 = starts.shape[0]
    N = src.shape[0]
    assert N % LANES == 0, "pad src to a lane multiple"
    NR = -(-span // LANES) + 1        # rows covering span at any phase
    IT = min(256, I0)
    I = -(-I0 // IT) * IT
    starts = jnp.clip(starts.astype(jnp.int32), 0, N - NR * LANES)
    if I != I0:
        starts = jnp.pad(starts, (0, I - I0))
    src2d = src.reshape(N // LANES, LANES)
    W = NR * LANES

    def kernel(w0_ref, src_ref, w0v_ref, out_ref):
        i0 = pl.program_id(0) * IT

        def run(scratch, sems):
            def mk(r, slot):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(w0_ref[i0 + r] // LANES, NR), :],
                    scratch.at[r],
                    sems.at[slot],
                )

            def body(r, _):
                @pl.when(r >= _NSEM)
                def _():
                    mk(r - _NSEM, (r - _NSEM) % _NSEM).wait()
                mk(r, r % _NSEM).start()
                return 0

            jax.lax.fori_loop(0, IT, body, 0)

            def tail(j, _):
                r = IT - _NSEM + j
                @pl.when(r >= 0)
                def _():
                    mk(r, r % _NSEM).wait()
                return 0

            jax.lax.fori_loop(0, _NSEM, tail, 0)

            # phase-align: per-row LEFT rotate by starts % LANES (< 128,
            # so 7 conditional rolls suffice)
            x = scratch[:].reshape(IT, W)
            off = w0v_ref[:] % LANES              # (IT, 1)
            b = 1
            while b < LANES:
                bit = (off & b) != 0
                x = jnp.where(bit, pltpu.roll(x, shift=W - b, axis=1), x)
                b <<= 1
            out_ref[:] = x[:, :span]

        pl.run_scoped(
            run,
            pltpu.VMEM((IT, NR, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        )

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
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((I, span), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, src2d, starts[:, None])
    return out[:I0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    src2d: jax.Array,    # (R, Lr) int32
    rows: jax.Array,     # (I,) int32, clipped here to [0, R)
    *,
    interpret: bool = False,
) -> jax.Array:          # (I, Lr): out[i, :] = src2d[rows[i], :]
    I0 = rows.shape[0]
    R, Lr = src2d.shape
    IT = min(256, I0)
    I = -(-I0 // IT) * IT
    rows = jnp.clip(rows.astype(jnp.int32), 0, R - 1)
    if I != I0:
        rows = jnp.pad(rows, (0, I - I0))
    # lane-tile the row dimension: both DMA endpoints are LEADING-dim
    # slices of >=3D refs (tiling binds only the last two dims — a
    # (1, Lr) slice of a 2D ref is rejected: "must be aligned to
    # tiling (8)")
    LT = -(-Lr // LANES)
    Lrp = LT * LANES
    if Lrp != Lr:
        src2d = jnp.pad(src2d, ((0, 0), (0, Lrp - Lr)))
    src3d = src2d.reshape(R, LT, LANES)

    def kernel(rw_ref, src_ref, out_ref):
        i0 = pl.program_id(0) * IT

        def run(scratch, sems):
            def mk(r, slot):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(rw_ref[i0 + r], 1)],
                    scratch.at[r],
                    sems.at[slot],
                )

            def body(r, _):
                @pl.when(r >= _NSEM)
                def _():
                    mk(r - _NSEM, (r - _NSEM) % _NSEM).wait()
                mk(r, r % _NSEM).start()
                return 0

            jax.lax.fori_loop(0, IT, body, 0)

            def tail(j, _):
                r = IT - _NSEM + j
                @pl.when(r >= 0)
                def _():
                    mk(r, r % _NSEM).wait()
                return 0

            jax.lax.fori_loop(0, _NSEM, tail, 0)
            out_ref[:] = scratch[:].reshape(IT, Lrp)

        pl.run_scoped(
            run,
            pltpu.VMEM((IT, 1, LT, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(I // IT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (IT, Lrp), lambda i, rw: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((I, Lrp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows, src3d)
    return out[:I0, :Lr]
