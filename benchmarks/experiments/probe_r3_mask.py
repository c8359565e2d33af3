"""TPU probe (round 3b): masking strategy for the fused slab kernel.

Splits kernel vs epilogue under the round-3 per-table top-k, and compares
three mask modes at the 2M bench point:
  kernel — in-register concat mask (round-3 first cut)
  none   — no mask: overfetched lanes are real CSR neighbors (free
           multiprobe); pad rows are killed by id in the dedup epilogue
  xla    — mask applied outside as an XLA where (round-2 form)
"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from crypto_rec_tpu.models.lsh.index import build_index, pack_index, query_hashes
from crypto_rec_tpu.ops.pallas.slabscore import (
    slab_window_dots, slab_topk, _ALIGN)
from crypto_rec_tpu.utils.timing import hard_sync

N, D, Q, TOPK = 2_000_000, 128, 8192, 10
L, K, WIN = 8, 13, 488

corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
queries = jax.random.normal(jax.random.PRNGKey(7), (Q, D), jnp.float32)
hard_sync(corpus); hard_sync(queries)
idx = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                  lsh_bucket_div=4, euclidean_h_w=1.0, use_pallas=True)
pidx = pack_index(idx, corpus, dtype=jnp.bfloat16)
hard_sync(jax.tree_util.tree_leaves(pidx))
qb, _ = query_hashes(pidx, queries)
qb = hard_sync(qb)
print("ready", flush=True)


def timed(fn, reps=5):
    out = None; ts = []
    for _ in range(reps):
        del out
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


@functools.partial(jax.jit, static_argnames=("per_table",))
def wparams(bucket_starts, q_buckets, per_table):
    l_idx = jnp.arange(q_buckets.shape[1], dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1)
    return s0, jnp.minimum(end - s0, per_table)

s0, sizes = wparams(pidx.bucket_starts, qb, WIN)
s0 = hard_sync(s0); sizes = hard_sync(sizes)
qv = queries / jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
qv = hard_sync(qv)

# A: current (in-kernel concat mask) kernel only
kern = jax.jit(functools.partial(slab_window_dots, per_table=WIN))
t, (dots, a0) = timed(lambda: kern(pidx.packed, None, s0, sizes, qv))
print(f"A kernel (concat mask):   {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)

# B: new per-table topk epilogue only
topk = jax.jit(functools.partial(slab_topk, n_rows=N, top_k=TOPK))
t, _ = timed(lambda: topk(dots, a0, pidx.packed_rows))
print(f"B per-table topk only:    {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)


# C: maskless kernel (raw dots out) + topk
def make_kernel_nomask(L, win, d, qt, nbuf):
    def kernel(meta_ref, packed_hbm, q_ref, dots_ref, slab, sem_s):
        def dma(slot, qi, l):
            start = pl.multiple_of(meta_ref[qi, l], _ALIGN)
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start, win), :],
                slab.at[slot, l], sem_s.at[slot, l])
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
            x = slab[slot].reshape(L * win, d)
            vec = q_ref[qi, :]
            dots_ref[qi] = jnp.sum(
                x.astype(jnp.float32) * vec[None, :], axis=1
            ).reshape(L, win)
            return 0
        jax.lax.fori_loop(0, qt, step, 0)
    return kernel


@functools.partial(jax.jit, static_argnames=("per_table", "q_tile", "nbuf"))
def dots_nomask(packed, starts, queries, per_table, q_tile=16, nbuf=4):
    Lx, n_pad, d = packed.shape
    q = queries.shape[0]
    win = (per_table + _ALIGN + 127) // 128 * 128
    aligned = jnp.minimum((starts // _ALIGN) * _ALIGN, n_pad - win)
    pad_q = (-q) % q_tile
    al_p = jnp.pad(aligned, ((0, pad_q), (0, 0)))
    q_p = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qp = q + pad_q
    l_off = jnp.arange(Lx, dtype=jnp.int32) * n_pad
    meta = (al_p + l_off[None, :]).astype(jnp.int32)
    out = pl.pallas_call(
        make_kernel_nomask(Lx, win, d, q_tile, nbuf),
        grid=(qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, Lx), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((q_tile, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q_tile, Lx, win), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((qp, Lx, win), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, Lx, win, d), packed.dtype),
            pltpu.SemaphoreType.DMA((nbuf, Lx)),
        ],
    )(meta, packed.reshape(Lx * n_pad, d), q_p.astype(jnp.float32))
    return out[:q], aligned


t, (dots_nm, a_nm) = timed(lambda: dots_nomask(pidx.packed, s0, qv, WIN))
print(f"C kernel (no mask):       {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)


def full_nomask():
    dd, aa = dots_nomask(pidx.packed, s0, qv, WIN)
    return topk(dd, aa, pidx.packed_rows)
t, out_nm = timed(full_nomask)
print(f"D nomask kern+topk:       {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)


# E: xla-mask variant: mask outside, fused into topk consumer
@jax.jit
def full_xlamask():
    dd, aa = dots_nomask(pidx.packed, s0, qv, WIN)
    head = s0 - aa
    size = jnp.minimum(jnp.minimum(sizes, WIN), ((WIN + _ALIGN + 127)//128*128) - head)
    lane = jnp.arange(dd.shape[2], dtype=jnp.int32)[None, None, :]
    valid = (lane >= head[:, :, None]) & (lane < (head + size)[:, :, None])
    dd = jnp.where(valid, dd, -jnp.inf)
    return topk(dd, aa, pidx.packed_rows)
t, out_xm = timed(full_xlamask)
print(f"E xlamask kern+topk:      {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)

# sanity: nomask ids superset-score >= xlamask scores rank-for-rank
s_nm, i_nm = out_nm; s_xm, i_xm = out_xm
print("rank-for-rank nomask >= masked:",
      bool(jnp.all(s_nm + 1e-5 >= s_xm)), flush=True)
agree = float(jnp.mean((i_nm == i_xm).astype(jnp.float32)))
print(f"id agreement nomask vs masked: {agree:.4f}", flush=True)
