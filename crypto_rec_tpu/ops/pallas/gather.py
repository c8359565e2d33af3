"""Bucket-window gather Pallas kernel.

The query-time hot loop of the CSR index path: for each query and table,
copy a contiguous window of the table's sorted-row array starting at the
query's bucket offset.  The XLA path expresses this as vmapped dynamic
gathers; this kernel drives it as direct DMAs from HBM with the per-query
(start, size) scalars delivered through SMEM — the "bucket-gather kernel"
of BASELINE.json.

Layout: sorted_rows is flattened [L * n] so a single HBM ref serves all
tables (table l's window for a query starts at l * n + bucket_start).
Out-of-window lanes are masked to the sentinel by comparing an iota against
the window size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(L: int, W: int, n_rows: int):
    def kernel(meta_ref, rows_hbm, out_ref, scratch, sem):
        # meta_ref: SMEM [1, 2*L] — starts (absolute, pre-offset by l*n)
        # then sizes, for this query.
        def copy_table(l, _):
            start = meta_ref[0, l]
            dma = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(start, W)],
                scratch.at[l],
                sem.at[l],
            )
            dma.start()
            return 0

        jax.lax.fori_loop(0, L, copy_table, 0, unroll=True)

        def finish_table(l, _):
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(meta_ref[0, l], W)], scratch.at[l], sem.at[l]
            ).wait()
            return 0

        jax.lax.fori_loop(0, L, finish_table, 0, unroll=True)

        lane = jax.lax.broadcasted_iota(jnp.int32, (L, W), dimension=1)
        sizes = jnp.stack([meta_ref[0, L + l] for l in range(L)])[:, None]
        out_ref[0] = jnp.where(lane < sizes, scratch[:], jnp.int32(n_rows))

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def gather_bucket_windows(
    sorted_rows: jax.Array,    # [L, n] int32 CSR member arrays
    starts: jax.Array,         # [q, L] int32 window starts (within table)
    sizes: jax.Array,          # [q, L] int32 valid window lengths (<= window)
    window: int,
    interpret: bool = False,
) -> jax.Array:
    """-> [q, L, window] int32 row ids; invalid lanes = n (sentinel).

    Precondition (CSR invariant): starts[i, l] + sizes[i, l] <= n — windows
    never extend past their table.  Lanes beyond `sizes` may be DMA'd from
    the next table's region but are always masked to the sentinel.
    """
    L, n = sorted_rows.shape
    q = starts.shape[0]
    flat = sorted_rows.reshape(-1)
    # pad the tail so a window starting near n never reads out of bounds
    flat = jnp.pad(flat, (0, window), constant_values=n)
    table_base = jnp.arange(L, dtype=jnp.int32)[None, :] * n
    abs_starts = jnp.clip(starts, 0, n - 1) + table_base
    meta = jnp.concatenate([abs_starts, sizes], axis=1)  # [q, 2L]

    out = pl.pallas_call(
        _make_kernel(L, window, n),
        grid=(q,),
        in_specs=[
            pl.BlockSpec((1, 2 * L), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, L, window), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q, L, window), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L, window), jnp.int32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
        interpret=interpret,
    )(meta, flat)
    return out
