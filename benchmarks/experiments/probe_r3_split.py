"""TPU probe (round 3): where do the slab kernel's 17.6 us/query go?

Splits the fused slab-score retrieval into components at the 2M bench
operating point's shapes (random corpus — timing only, no recall):

  A. full pallas retrieve (kernel + topk epilogue)   — the baseline
  B. slab_window_dots alone                          — kernel share
  C. slab_topk alone on cached dots                  — epilogue share
  D. kernel, DMA-only scoring (write zeros)          — DMA/loop floor
  E. kernel, MXU scoring: [L*win, d] x [d, 128] replicated-query matmul
  F. nbuf / q_tile sweeps on the best scorer

Findings feed the round-3 kernel redesign; results recorded in git log.
"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, functools, numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.models.lsh.index import build_index, pack_index, query_hashes
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots, slab_topk
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("PROBE_N", 2_000_000))
D, Q, TOPK = 128, 8192, 10
L, K, WIN = 8, 13, 488

key = jax.random.PRNGKey(0)
corpus = jax.random.normal(key, (N, D), jnp.float32)
queries = jax.random.normal(jax.random.PRNGKey(7), (Q, D), jnp.float32)
hard_sync(corpus); hard_sync(queries)
print(f"random corpus ready N={N}", flush=True)

idx = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                  lsh_bucket_div=4, euclidean_h_w=1.0, use_pallas=True)
pidx = pack_index(idx, corpus, dtype=jnp.bfloat16)
hard_sync(jax.tree_util.tree_leaves(pidx))
qb, _ = query_hashes(pidx, queries)
qb = hard_sync(qb)
print("packed index ready", flush=True)


@functools.partial(jax.jit, static_argnames=("per_table",))
def window_params(bucket_starts, q_buckets, per_table):
    l_idx = jnp.arange(q_buckets.shape[1], dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1)
    sizes = jnp.minimum(end - s0, per_table)
    return s0, sizes

s0, sizes = window_params(pidx.bucket_starts, qb, WIN)
s0 = hard_sync(s0); sizes = hard_sync(sizes)
qv = queries / jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
qv = hard_sync(qv)


def timed(fn, reps=5):
    out = None; ts = []
    for _ in range(reps):
        del out
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


# --- A/B/C: split current path -------------------------------------------
kern = jax.jit(functools.partial(slab_window_dots, per_table=WIN))
t, (dots, a0) = timed(lambda: kern(pidx.packed, None, s0, sizes, qv))
print(f"B kernel only (fused, VPU):  {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)

topk = jax.jit(functools.partial(slab_topk, n_rows=N, top_k=TOPK))
t2, _ = timed(lambda: topk(dots, a0, pidx.packed_rows))
print(f"C topk epilogue only:        {t2*1e3:7.1f} ms  {Q/t2:8.0f} q/s", flush=True)


def full():
    d_, a_ = kern(pidx.packed, None, s0, sizes, qv)
    return topk(d_, a_, pidx.packed_rows)
t3, _ = timed(full)
print(f"A kernel + topk:             {t3*1e3:7.1f} ms  {Q/t3:8.0f} q/s", flush=True)

# --- D/E: kernel variants -------------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
_ALIGN = 32


def variant_kernel(L, win, d, qt, nbuf, mode):
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
            if mode == "zeros":
                dots_ref[qi] = jnp.zeros((L, win), jnp.float32) + x[0, 0].astype(jnp.float32)
            elif mode == "vpu":
                vec = q_ref[qi, :]
                dots_ref[qi] = jnp.sum(
                    x.astype(jnp.float32) * vec[None, :], axis=1
                ).reshape(L, win)
            elif mode == "mxu_rep":
                # replicated-query matmul: [L*win, d] x [d, 128] -> keep col 0
                qrep = jnp.broadcast_to(q_ref[qi, :][:, None], (d, 128))
                full = jax.lax.dot_general(
                    x, qrep.astype(x.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dots_ref[qi] = full[:, 0].reshape(L, win)
            elif mode == "mxu_tile":
                # whole q-tile matmul: [L*win, d] x [d, qt] -> dynamic col qi
                full = jax.lax.dot_general(
                    x, q_ref[:].T.astype(x.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                col = jax.lax.dynamic_slice(full, (0, qi), (L * win, 1))
                dots_ref[qi] = col.reshape(L, win)
            return 0
        jax.lax.fori_loop(0, qt, step, 0)
    return kernel


@functools.partial(jax.jit, static_argnames=("per_table", "q_tile", "nbuf", "mode"))
def run_variant(packed, starts, sizes, queries, per_table, q_tile, nbuf, mode):
    Lx, n_pad, d = packed.shape
    q = queries.shape[0]
    win = (per_table + _ALIGN + 127) // 128 * 128
    aligned = jnp.minimum((starts // _ALIGN) * _ALIGN, n_pad - win)
    pad_q = (-q) % q_tile
    if pad_q:
        aligned = jnp.pad(aligned, ((0, pad_q), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qp = q + pad_q
    l_off = jnp.arange(Lx, dtype=jnp.int32) * n_pad
    meta = (aligned + l_off[None, :]).astype(jnp.int32)
    kernel = variant_kernel(Lx, win, d, q_tile, nbuf, mode)
    return pl.pallas_call(
        kernel,
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
    )(meta, packed.reshape(Lx * n_pad, d), queries.astype(jnp.float32))


for mode in ("zeros", "vpu", "mxu_rep", "mxu_tile"):
    for nbuf in (2, 3, 4):
        for qt in (16, 32):
            try:
                t, _ = timed(lambda: run_variant(
                    pidx.packed, s0, sizes, qv, WIN, qt, nbuf, mode))
                print(f"D/E {mode:8s} nbuf={nbuf} qt={qt}: {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
            except Exception as e:
                print(f"D/E {mode:8s} nbuf={nbuf} qt={qt}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
            break  # qt sweep only for winning mode later
