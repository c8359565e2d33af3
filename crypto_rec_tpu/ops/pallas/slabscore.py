"""Fused slab-gather + dot Pallas kernel — the packed-index hot loop.

The XLA packed retrieve path (models/lsh/index.packed_retrieve_core)
gathers each query's per-table bucket windows as aligned W-row blocks into
an HBM temporary ([q_block, L*B, W, d]) and then einsums it against the
queries.  That materialization is the bottleneck: the candidate tensor is
written to HBM by the gather and read back by the einsum, tripling the
traffic of the slab bytes themselves, and the per-query matvec einsum
cannot amortize it.

This kernel removes the round trip: for each (query, table) the bucket
window is DMA'd HBM -> VMEM (pl.ds dynamic start at row granularity — no
block alignment, no B/W over-fetch) and dotted against the query vector
while the next window's DMA is already in flight (NBUF-deep pipeline).
Only the [q, L, win] dot products and row ids ever touch HBM.

Supports the bf16 and int8-quantized slab layouts (int8 windows carry a
per-row dequant scale).  Cosine only: rows are pre-normalized by
pack_index, so the dot IS the similarity.  Reference semantics mirrored:
one window per hash table per query, L-table union downstream
(/root/reference/lib/lsh_cube.hpp:77-106).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(L: int, win: int, d: int, qt: int, quantized: bool,
                 nbuf: int = 4):
    def kernel(meta_ref, packed_hbm, rows_hbm, scale_hbm, q_ref,
               dots_ref, ids_ref, slab, rowsb, scaleb, sem_s, sem_r, sem_c):
        total = qt * L

        def dmas(slot, w):
            qi = w // L
            l = w % L
            start = meta_ref[qi, l]
            out = [
                pltpu.make_async_copy(
                    packed_hbm.at[pl.ds(start, win), :],
                    slab.at[slot], sem_s.at[slot],
                ),
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(start, win)],
                    rowsb.at[slot], sem_r.at[slot],
                ),
            ]
            if quantized:
                out.append(pltpu.make_async_copy(
                    scale_hbm.at[pl.ds(start, win)],
                    scaleb.at[slot], sem_c.at[slot],
                ))
            return out

        def start_w(w):
            for dma in dmas(w % nbuf, w):
                dma.start()

        # warm-up: fill the pipeline
        def warm(w, _):
            start_w(w)
            return 0

        depth = min(nbuf - 1, total)
        jax.lax.fori_loop(0, depth, warm, 0, unroll=True)

        def step(w, _):
            @pl.when(w + depth < total)
            def _():
                start_w(w + depth)

            slot = w % nbuf
            for dma in dmas(slot, w):
                dma.wait()
            qi = w // L
            l = w % L
            vec = q_ref[qi, :].astype(jnp.float32)          # [d]
            x = slab[slot].astype(jnp.float32)              # [win, d]
            dots = jax.lax.dot_general(
                x, vec.reshape(d, 1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, 0]                                          # [win]
            if quantized:
                dots = dots * scaleb[slot]
            size = meta_ref[qi, L + l]
            lane = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)[:, 0]
            valid = lane < size
            dots_ref[qi, l, :] = jnp.where(valid, dots, -jnp.inf)
            ids_ref[qi, l, :] = jnp.where(valid, rowsb[slot], jnp.int32(-1))
            return 0

        jax.lax.fori_loop(0, total, step, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("per_table", "q_tile", "interpret")
)
def slab_window_scores(
    packed: jax.Array,           # [L, n_pad, d] bf16/int8 CSR-ordered slabs
    packed_rows: jax.Array,      # [L, n_pad] int32 (sentinel past the end)
    packed_scale: Optional[jax.Array],  # [L, n_pad] f32 (int8 slabs only)
    starts: jax.Array,           # [q, L] int32 window starts within a table
    sizes: jax.Array,            # [q, L] int32 valid rows per window
    queries: jax.Array,          # [q, d] f32, pre-normalized for cosine
    per_table: int,
    q_tile: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (dots [q, L, win] f32 with -inf outside the window,
           row ids [q, L, win] int32 with -1 outside).

    win = per_table rounded up to a 128 lane multiple; rows in
    [size, win) are masked, so callers see exactly the per_table window
    semantics of packed_retrieve_core.
    """
    L, n_pad, d = packed.shape
    q = queries.shape[0]
    win = (per_table + 127) // 128 * 128
    if n_pad < win:
        raise ValueError(f"window {win} exceeds packed length {n_pad}")
    quantized = jnp.issubdtype(packed.dtype, jnp.integer)
    if quantized and packed_scale is None:
        raise ValueError("int8 slabs require packed_scale")

    pad_q = (-q) % q_tile
    if pad_q:
        starts = jnp.pad(starts, ((0, pad_q), (0, 0)))
        sizes = jnp.pad(sizes, ((0, pad_q), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qp = q + pad_q

    # absolute row offsets into the flattened [L * n_pad, d] slab array;
    # clamp so start + win stays in range (sizes already bound validity)
    l_off = jnp.arange(L, dtype=jnp.int32) * n_pad
    abs_start = jnp.minimum(starts, n_pad - win) + l_off[None, :]
    meta = jnp.concatenate(
        [abs_start, jnp.minimum(sizes, per_table)], axis=1
    ).astype(jnp.int32)                                   # [qp, 2L]

    scale_flat = (
        packed_scale.reshape(L * n_pad)
        if quantized else jnp.zeros((1,), jnp.float32)
    )

    kernel = _make_kernel(L, win, d, q_tile, bool(quantized))
    scratch = [
        pltpu.VMEM((4, win, d), packed.dtype),
        pltpu.VMEM((4, win), jnp.int32),
        pltpu.VMEM((4, win), jnp.float32),
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    dots, ids = pl.pallas_call(
        kernel,
        grid=(qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 2 * L), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((q_tile, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, L, win), lambda i: (i, 0, 0)),
            pl.BlockSpec((q_tile, L, win), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, L, win), jnp.float32),
            jax.ShapeDtypeStruct((qp, L, win), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        meta,
        packed.reshape(L * n_pad, d),
        packed_rows.reshape(L * n_pad),
        scale_flat,
        queries.astype(jnp.float32),
    )
    return dots[:q], ids[:q]
