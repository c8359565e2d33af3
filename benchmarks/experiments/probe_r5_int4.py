"""Round-5 probe #5: int4-packed slabs (VERDICT r4 weak #4, last untried
idea).

The fused kernel streams 285 GB/s (~35% of v5e HBM) at the 2M point and
deeper DMA pipelining is a no-op — so is the kernel DMA-bound (int4's
half bytes should approach 2x) or VPU-bound (the f32 multiply+reduce work
is unchanged, so int4 buys nothing)?  The bf16->int8 step was ~1.4x
inside the kernel, which argues bytes matter; this probe settles it.

Layout: two ADJACENT CSR rows per slab byte (hi nibble = even row, lo
nibble = odd row), so the lane axis stays d=128 and a window of W CSR
rows is a [W/2, d] uint8 DMA.  Window starts align to 64 CSR rows (32
int4-rows, the int8 sublane tile).  The kernel unpacks nibbles with
VPU shifts/masks and emits dots as [L, 2, W/2] halves; the epilogue maps
lane j -> CSR offset (2j | 2j+1) when recovering row ids.

Quantization: global-scale symmetric int4 (scale amax/7).  On normalized
cosine rows the per-component step is ~1.6x the component std — ranking
noise is real, so recall is measured, not assumed.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

from crypto_rec_tpu.io.synth import planted_clustered_corpus
from crypto_rec_tpu.models.lsh.index import (
    build_index, pack_index, query_hashes,
)
from crypto_rec_tpu.ops.pallas.slabscore import (
    _dedup_topk_pairs, slab_window_dots, slab_topk,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
Q = int(os.environ.get("BENCH_Q", 32768))
K = int(os.environ.get("BENCH_LSH_K", 13))
D, L, PT, TOPK = 128, 8, 488, 10
_ALIGN4 = 64   # CSR-row alignment: 32 int4-rows = the int8 sublane tile


def timed(fn, reps=5):
    out, ts = None, []
    for _ in range(reps):
        del out
        t0 = time.perf_counter()
        out = fn()
        hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _make_kernel_int4(L: int, win: int, d: int, qt: int, nbuf: int = 4):
    """Fused per-query kernel over nibble-packed slabs: [win/2, d] uint8
    DMA per table, VPU nibble unpack, two f32 dot rows per int4-row."""
    win2 = win // 2

    def kernel(meta_ref, packed_hbm, q_ref, dots_ref, slab, sem_s):
        def dma(slot, qi, l):
            start = pl.multiple_of(meta_ref[qi, l], _ALIGN4 // 2)
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start, win2), :],
                slab.at[slot, l], sem_s.at[slot, l],
            )

        def issue(slot, qi):
            for l in range(L):
                dma(slot, qi, l).start()

        depth = min(nbuf - 1, qt)
        for pre in range(depth):
            issue(pre, pre)

        def step(qi, _):
            @pl.when(qi + depth < qt)
            def _():
                issue((qi + depth) % nbuf, qi + depth)

            slot = qi % nbuf
            for l in range(L):
                dma(slot, qi, l).wait()
            x = slab[slot].reshape(L * win2, d).astype(jnp.int32)
            hi = ((x >> 4) ^ 8) - 8            # even CSR rows, [-8, 7]
            lo = ((x & 15) ^ 8) - 8            # odd CSR rows
            vec = q_ref[qi, :]                 # [d] f32
            dh = jnp.sum(hi.astype(jnp.float32) * vec[None, :], axis=1)
            dl = jnp.sum(lo.astype(jnp.float32) * vec[None, :], axis=1)
            dots_ref[qi] = jnp.concatenate(
                [dh.reshape(L, win2), dl.reshape(L, win2)], axis=1
            )                                  # [L, win]: halves layout
            return 0

        jax.lax.fori_loop(0, qt, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("per_table", "q_tile", "nbuf"))
def slab_window_dots_int4(
    packed4: jax.Array,          # [L, n_pad//2, d] uint8 nibble pairs
    starts: jax.Array,           # [q, L] CSR-row window starts
    queries: jax.Array,          # [q, d] f32 normalized
    per_table: int,
    q_tile: int = 16,
    nbuf: int = 4,
):
    """-> (dots [q, L, win] f32 in hi/lo-halves layout, aligned CSR
    starts [q, L]).  Lane j of table l scores CSR position
    aligned + 2*j (j < win/2) or aligned + 2*(j - win/2) + 1."""
    n_pad2, d = packed4.shape[1], packed4.shape[2]
    Lp = packed4.shape[0]
    q = queries.shape[0]
    win = (per_table + _ALIGN4 + 127) // 128 * 128
    aligned = jnp.minimum(
        (starts // _ALIGN4) * _ALIGN4, 2 * n_pad2 - win)
    pad_q = (-q) % q_tile
    if pad_q:
        aligned = jnp.pad(aligned, ((0, pad_q), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qp = q + pad_q
    l_off = jnp.arange(Lp, dtype=jnp.int32) * n_pad2
    meta = (aligned // 2 + l_off[None, :]).astype(jnp.int32)   # int4-rows
    kernel = _make_kernel_int4(Lp, win, d, q_tile, nbuf)
    dots = pl.pallas_call(
        kernel,
        grid=(qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, Lp), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((q_tile, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q_tile, Lp, win), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((qp, Lp, win), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, Lp, win // 2, d), jnp.uint8),
            pltpu.SemaphoreType.DMA((nbuf, Lp)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(meta, packed4.reshape(-1, d), queries.astype(jnp.float32))
    return dots[:q], aligned[:q]


def slab_topk_int4(dots, aligned, packed_rows, n_rows, top_k, kk=None):
    """Per-table stage-1 + dedup with the hi/lo halves lane mapping."""
    q, Lp, win = dots.shape
    win2 = win // 2
    n_pad = packed_rows.shape[1]
    kk = min(kk or top_k, win)
    rows = dots.reshape(q * Lp, win)
    s1, lane = jax.lax.approx_max_k(rows, kk, recall_target=0.9)
    s1 = s1.reshape(q, Lp * kk)
    lane = lane.reshape(q, Lp, kk)
    off = jnp.where(lane < win2, 2 * lane, 2 * (lane - win2) + 1)
    gpos = (
        jnp.arange(Lp, dtype=jnp.int32)[None, :, None] * n_pad
        + jnp.minimum(aligned[:, :, None] + off, n_pad - 1)
    ).reshape(q, Lp * kk)
    ids1 = packed_rows.reshape(-1)[gpos]
    ids1 = jnp.where(s1 > -jnp.inf, ids1, n_rows)
    return _dedup_topk_pairs(s1, ids1, n_rows, top_k)


def main():
    key = jax.random.PRNGKey(0)
    corpus, qa, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus = hard_sync(corpus)
    qs = hard_sync(qa[:Q])
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        4, 8.0, use_pallas=True)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))

    # int4 repack from the int8 slabs (probe shortcut: requantize the
    # already-global-scale int8 values to 4 bits; <=0.5 int8-LSB extra
    # rounding vs quantizing from f32)
    @jax.jit
    def repack(p8):
        def one_table(t):
            v4 = jnp.clip(
                jnp.round(t.astype(jnp.float32) * (7.0 / 127.0)), -7, 7
            ).astype(jnp.int32)
            hi = v4[0::2]
            lo = v4[1::2]
            return (((hi & 0xF) << 4) | (lo & 0xF)).astype(jnp.uint8)

        # per-table map: a whole-slab f32 temp is 8 GB at the 2M point
        # (measured: 17.2 G HBM OOM when done in one shot)
        return jax.lax.map(one_table, p8)

    packed4 = hard_sync(repack(pidx.packed))
    print(f"int8 slabs {pidx.packed.nbytes/1e9:.2f} GB -> int4 "
          f"{packed4.nbytes/1e9:.2f} GB", flush=True)

    qb, _ = query_hashes(pidx, qs)
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = pidx.bucket_starts[l_idx[None, :], qb]
    end = pidx.bucket_starts[l_idx[None, :], qb + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (qb * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
    sizes = jnp.minimum(end - s0, PT)
    qv = qs / jnp.maximum(jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
    s0, sizes, qv = hard_sync(s0), hard_sync(sizes), hard_sync(qv)

    win8 = (PT + 32 + 127) // 128 * 128
    win4 = (PT + _ALIGN4 + 127) // 128 * 128
    gb8 = Q * L * win8 * D / 1e9
    gb4 = Q * L * (win4 // 2) * D / 1e9

    # --- raw kernels ---
    @jax.jit
    def k8(packed, s0_, sizes_, qv_):
        dots, a0 = slab_window_dots(
            packed, None, s0_, sizes_, qv_, per_table=PT, mask=False)
        return dots[:, 0, :8], a0

    @jax.jit
    def k4(packed, s0_, qv_):
        dots, a0 = slab_window_dots_int4(packed, s0_, qv_, per_table=PT)
        return dots[:, 0, :8], a0

    run8 = lambda: k8(pidx.packed, s0, sizes, qv)
    hard_sync(run8())
    t8 = timed(run8)
    print(f"raw int8 kernel: {t8*1e3:8.1f} ms  {Q/t8:>9,.0f} q/s  "
          f"{gb8/t8:6.1f} GB/s slab", flush=True)

    run4 = lambda: k4(packed4, s0, qv)
    hard_sync(run4())
    t4 = timed(run4)
    print(f"raw int4 kernel: {t4*1e3:8.1f} ms  {Q/t4:>9,.0f} q/s  "
          f"{gb4/t4:6.1f} GB/s slab ({gb8/t4:6.1f} int8-equiv)", flush=True)

    # --- end-to-end retrieval + recall ---
    @jax.jit
    def full8(packed, prows, s0_, sizes_, qv_):
        dots, a0 = slab_window_dots(
            packed, None, s0_, sizes_, qv_, per_table=PT, mask=False)
        return slab_topk(dots, a0, prows, N, TOPK, exact=False)

    @jax.jit
    def full4(packed, prows, s0_, qv_):
        dots, a0 = slab_window_dots_int4(packed, s0_, qv_, per_table=PT)
        return slab_topk_int4(dots, a0, prows, N, TOPK)

    rf8 = lambda: full8(pidx.packed, pidx.packed_rows, s0, sizes, qv)
    hard_sync(rf8())
    tf8 = timed(rf8)
    _, ids8 = rf8()
    rec8 = float(recall_at_k(ids8, true_idx))
    print(f"full int8: {tf8*1e3:8.1f} ms  {Q/tf8:>9,.0f} q/s  "
          f"recall {rec8:.4f}", flush=True)

    rf4 = lambda: full4(packed4, pidx.packed_rows, s0, qv)
    hard_sync(rf4())
    tf4 = timed(rf4)
    _, ids4 = rf4()
    rec4 = float(recall_at_k(ids4, true_idx))
    print(f"full int4: {tf4*1e3:8.1f} ms  {Q/tf4:>9,.0f} q/s  "
          f"recall {rec4:.4f}", flush=True)


if __name__ == "__main__":
    main()
