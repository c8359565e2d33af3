"""Round-4 probe #4: block-transposed slabs — attacking the kernel's VPU
lane-reduce bound.

probe_r4_select.py: the fused slab kernel takes the same ~18 ms real for
int8 AND bf16 (129 vs 244 GB/s effective) — it is bound by the VPU dot
(`sum(x * vec, axis=1)`, a LANE-axis reduce: log2(128) shuffle-adds per
vreg, ~9 vreg-ops per 8 dots), not by DMA bytes.  That's why int8's half
bytes buy ~nothing.

Fix candidate: store each table's slab BLOCK-TRANSPOSED —
[n_pad/128, d, 128] — so a 128-row block sits as d sublane-rows x 128
window-lanes.  The dot becomes multiply by vec broadcast over lanes +
reduce over the SUBLANE axis (16 vector adds + 3 shuffle steps per 128
dots ≈ 0.27 vreg-ops/dot vs ~1.1): ~4x less VPU work, while a window's
bytes stay FULLY CONTIGUOUS in memory (blocks are adjacent), so DMA
shape/efficiency is unchanged.  Window starts align to 128 (vs 32) —
more overfetch head, same win width (640 = 5 blocks).

Measured here vs the production kernel at the 2M bench shapes, int8 and
bf16, with dot parity checked against the row-layout kernel.
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
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D = int(os.environ.get("BENCH_D", 128))
Q = int(os.environ.get("BENCH_Q", 8192))
K = int(os.environ.get("BENCH_LSH_K", 13))
L = int(os.environ.get("BENCH_LSH_L", 8))
PT = int(os.environ.get("BENCH_WINDOW", 488))
B = 128


def timed(fn, reps=5):
    out, times = None, []
    for _ in range(reps):
        del out
        t0 = time.perf_counter()
        out = fn()
        hard_sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def make_blk_kernel(L, nblk, d, qt, nbuf=4):
    """One step per query; L windows of nblk [d, B] blocks DMA'd together.

    meta_ref[qi, l] = BLOCK index of window l's first block in the
    flattened [L * n_pad / B] block axis."""
    def kernel(meta_ref, packed_hbm, q_ref, dots_ref, slab, sem_s):
        def dma(slot, qi, l):
            start = meta_ref[qi, l]
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start, nblk)],
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
            x = slab[slot]                        # [L, nblk, d, B]
            vec = q_ref[qi, :]                    # [d] f32
            # multiply with vec varying along the SUBLANE (d) axis, then
            # reduce over d — vector adds + a short shuffle tree instead
            # of a full lane-reduce per dot
            dots = jnp.sum(
                x.reshape(L * nblk, d, B).astype(jnp.float32)
                * vec[None, :, None],
                axis=1,
            )                                     # [L*nblk, B]
            dots_ref[qi] = dots.reshape(L, nblk * B)
            return 0

        jax.lax.fori_loop(0, qt, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("per_table", "q_tile", "nbuf"))
def blk_window_dots(packed_blk, starts, queries, per_table,
                    q_tile=16, nbuf=4):
    """packed_blk: [L, n_pad/B, d, B]; starts: [q, L] row starts."""
    Lk, npb, d, b = packed_blk.shape
    q = queries.shape[0]
    win = (per_table + B + 127) // 128 * 128
    nblk = win // B
    aligned = jnp.minimum((starts // B) * B, npb * B - win)
    pad_q = (-q) % q_tile
    if pad_q:
        aligned = jnp.pad(aligned, ((0, pad_q), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qp = q + pad_q
    l_off = jnp.arange(Lk, dtype=jnp.int32) * npb
    meta = (aligned // B + l_off[None, :]).astype(jnp.int32)
    kernel = make_blk_kernel(Lk, nblk, d, q_tile, nbuf)
    dots = pl.pallas_call(
        kernel,
        grid=(qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, Lk), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((q_tile, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q_tile, Lk, win), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((qp, Lk, win), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, Lk, nblk, d, b), packed_blk.dtype),
            pltpu.SemaphoreType.DMA((nbuf, Lk)),
        ],
    )(
        meta,
        packed_blk.reshape(-1, d, b),
        queries.astype(jnp.float32),
    )
    return dots[:q], aligned[:q]


def main():
    t00 = time.perf_counter()
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, _t = planted_clustered_corpus(key, N, D, Q, 10)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        lsh_bucket_div=4, euclidean_h_w=1.0)
    hard_sync(index.bucket_starts)

    pidx = None
    for dtype_name in ("int8", "bfloat16"):
        dtype = {"int8": jnp.int8, "bfloat16": jnp.bfloat16}[dtype_name]
        del pidx
        pidx = pack_index(index, corpus, dtype=dtype)
        hard_sync(jax.tree_util.tree_leaves(pidx))
        # blocked copy: [L, n_pad, d] -> [L, n_pad/B, d, B]
        n_pad = pidx.packed.shape[1]

        @jax.jit
        def to_blk(p):
            return jnp.swapaxes(
                p.reshape(Lv, n_pad // B, B, D), 2, 3)

        Lv = L
        packed_blk = hard_sync(to_blk(pidx.packed))
        print(f"[{dtype_name}] blk layout ready @"
              f"{time.perf_counter()-t00:.0f}s", flush=True)

        q_buckets, _ = query_hashes(pidx, queries)
        l_idx = jnp.arange(L, dtype=jnp.int32)
        start = pidx.bucket_starts[l_idx[None, :], q_buckets]
        end = pidx.bucket_starts[l_idx[None, :], q_buckets + 1]
        size = end - start
        golden = jnp.int32(-1640531527)
        mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
        s0 = start + jnp.remainder(
            jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
        sizes = jnp.minimum(end - s0, PT)
        qv = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)

        t_row = timed(lambda: slab_window_dots(
            pidx.packed, None, s0, sizes, qv, per_table=PT, mask=False))
        print(f"[{dtype_name}] row-layout kernel: {t_row*1e3:.1f} ms",
              flush=True)

        dots_b, a_b = blk_window_dots(packed_blk, s0, qv, PT)
        t_blk = timed(lambda: blk_window_dots(packed_blk, s0, qv, PT))
        print(f"[{dtype_name}] blk-layout kernel: {t_blk*1e3:.1f} ms",
              flush=True)

        # parity on overlapping lanes: recompute row kernel with the SAME
        # 128-aligned starts so lanes line up exactly
        dots_r2, a_r2 = slab_window_dots(
            pidx.packed, None, (s0 // B) * B, sizes, qv,
            per_table=PT, mask=False)
        d1 = np.asarray(dots_b[:8])
        d2 = np.asarray(dots_r2[:8])
        wmin = min(d1.shape[2], d2.shape[2])
        err = np.max(np.abs(d1[:, :, :wmin] - d2[:, :, :wmin]))
        print(f"[{dtype_name}] max |blk - row| on shared lanes: {err:.5f}",
              flush=True)
    print("done")


if __name__ == "__main__":
    main()
