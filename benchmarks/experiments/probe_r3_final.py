"""TPU probe (round 3d): final kernel design validation, serial run.

Planted-truth corpus at PROBE_N (recall signal matters here: maskless
windows, approx stage-1, and int8-no-rerank are all recall-affecting).
Measures end-to-end retrieve (kernel + epilogue) for:
  bf16: masked+exact (r3a), nomask+exact, nomask+approx
  int8: VPU f32 scoring vs MXU int8xint8->int32, nomask+approx, no rerank
Also times the corpus generator itself (bench.py's 562 s mystery).
"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from crypto_rec_tpu.io.synth import planted_clustered_corpus
from crypto_rec_tpu.models.lsh.index import build_index, pack_index, query_hashes
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots, slab_topk, _ALIGN
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("PROBE_N", 2_000_000))
D, Q, TOPK = 128, 8192, 10
L, K, WIN = 8, 13, 488

t0 = time.time()
corpus, queries, true_idx = planted_clustered_corpus(
    jax.random.PRNGKey(0), N, D, Q, TOPK)
hard_sync(corpus); hard_sync(queries)
print(f"planted corpus N={N}: {time.time()-t0:.1f}s (cold)", flush=True)
t0 = time.time()
c2, q2, _ = planted_clustered_corpus(jax.random.PRNGKey(9), N, D, Q, TOPK)
hard_sync(c2); hard_sync(q2)
print(f"planted corpus warm: {time.time()-t0:.1f}s", flush=True)
del c2, q2

idx = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                  lsh_bucket_div=4, euclidean_h_w=1.0, use_pallas=True)
print("index built", flush=True)


def timed(fn, reps=5):
    out = None; ts = []
    for _ in range(reps):
        del out
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


def make_kernel(L, win, d, qt, nbuf, score):  # score: vpu | mxu_i8
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
            if score == "vpu":
                vec = q_ref[qi, :].astype(jnp.float32)
                dots = jnp.sum(x.astype(jnp.float32) * vec[None, :], axis=1)
            else:  # mxu_i8: replicated int8 query, int32 accumulate
                qrep = jnp.broadcast_to(q_ref[qi, :][:, None], (d, 128))
                full = jax.lax.dot_general(
                    x, qrep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                dots = full[:, 0].astype(jnp.float32)
            dots_ref[qi] = dots.reshape(L, win)
            return 0
        jax.lax.fori_loop(0, qt, step, 0)
    return kernel


@functools.partial(jax.jit, static_argnames=("per_table", "q_tile", "nbuf", "score"))
def nomask_dots(packed, starts, queries, per_table, q_tile=16, nbuf=4, score="vpu"):
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
        make_kernel(Lx, win, d, q_tile, nbuf, score),
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
    )(meta, packed.reshape(Lx * n_pad, d), q_p)
    return out[:q], aligned


def dedup_topk(s1, ids1, n_rows, top_k):
    q, m1 = s1.shape
    safe = jnp.minimum(ids1, n_rows - 1)
    order = jnp.argsort(ids1, axis=1)
    ids_s = jnp.take_along_axis(safe, order, axis=1)
    raw_s = jnp.take_along_axis(ids1, order, axis=1)
    s_s = jnp.take_along_axis(s1, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((q, 1), bool), raw_s[:, 1:] == raw_s[:, :-1]], axis=1)
    s_s = jnp.where(dup | (raw_s >= n_rows) | ~jnp.isfinite(s_s), -jnp.inf, s_s)
    s2, pos2 = jax.lax.top_k(s_s, top_k)
    out_ids = jnp.where(s2 > -jnp.inf, jnp.take_along_axis(ids_s, pos2, axis=1), -1)
    return s2, out_ids


@functools.partial(jax.jit, static_argnames=("per_table", "top_k", "m1", "approx", "score"))
def retrieve_nomask(packed, packed_rows, bucket_starts, n_rows, queries,
                    q_buckets, per_table, top_k, m1, approx, score="vpu"):
    Lx, n_pad, _d = packed.shape
    l_idx = jnp.arange(Lx, dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1)
    dots, a0 = nomask_dots(packed, s0, queries, per_table, score=score)
    q = queries.shape[0]
    win = dots.shape[2]
    flat = dots.reshape(q, Lx * win)
    if approx:
        s1, pos1 = jax.lax.approx_max_k(flat, m1, recall_target=0.95)
    else:
        s1, pos1 = jax.lax.top_k(flat, m1)
    l_of = pos1 // win
    lane = pos1 % win
    a = jnp.take_along_axis(a0, l_of, axis=1)
    gpos = l_of * n_pad + jnp.minimum(a + lane, n_pad - 1)
    ids1 = packed_rows.reshape(-1)[gpos]
    return dedup_topk(s1, ids1, n_rows, top_k)


qvf = queries / jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
qvf = hard_sync(qvf)

# ---- bf16 ----
pidx = pack_index(idx, corpus, dtype=jnp.bfloat16)
hard_sync(jax.tree_util.tree_leaves(pidx))
qb, _ = query_hashes(pidx, queries)
qb = hard_sync(qb)

# r3a masked+exact (current committed form)
@functools.partial(jax.jit, static_argnames=("per_table", "top_k"))
def masked_exact(packed, packed_rows, bucket_starts, n_rows, queries, q_buckets,
                 per_table, top_k):
    Lx = packed.shape[0]
    l_idx = jnp.arange(Lx, dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1)
    sizes = jnp.minimum(end - s0, per_table)
    dots, a0 = slab_window_dots(packed, None, s0, sizes, queries,
                                per_table=per_table)
    return slab_topk(dots, a0, packed_rows, n_rows, top_k)

for name, fn in [
    ("bf16 masked+exact   ", lambda: masked_exact(
        pidx.packed, pidx.packed_rows, pidx.bucket_starts, N, qvf, qb, WIN, TOPK)),
    ("bf16 nomask+exact   ", lambda: retrieve_nomask(
        pidx.packed, pidx.packed_rows, pidx.bucket_starts, N, qvf, qb, WIN,
        TOPK, L * TOPK, False)),
    ("bf16 nomask+approx80", lambda: retrieve_nomask(
        pidx.packed, pidx.packed_rows, pidx.bucket_starts, N, qvf, qb, WIN,
        TOPK, L * TOPK, True)),
    ("bf16 nomask+approx40", lambda: retrieve_nomask(
        pidx.packed, pidx.packed_rows, pidx.bucket_starts, N, qvf, qb, WIN,
        TOPK, 4 * TOPK, True)),
]:
    try:
        t, out = timed(fn)
        r = float(recall_at_k(out[1], true_idx))
        print(f"{name}: {t*1e3:7.1f} ms  {Q/t:8.0f} q/s  recall {r:.4f}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
del pidx

# ---- int8 global-scale, no rerank ----
pidx = pack_index(idx, corpus, dtype=jnp.int8)
hard_sync(jax.tree_util.tree_leaves(pidx))
qb, _ = query_hashes(pidx, queries)
qb = hard_sync(qb)
# quantize queries per-row for the MXU form
qsc = jnp.max(jnp.abs(qvf), axis=1, keepdims=True) / 127.0
q_i8 = jnp.clip(jnp.round(qvf / qsc), -127, 127).astype(jnp.int8)
q_i8 = hard_sync(q_i8)

for name, fn in [
    ("int8 vpu nomask+approx80", lambda: retrieve_nomask(
        pidx.packed, pidx.packed_rows, pidx.bucket_starts, N, qvf, qb, WIN,
        TOPK, L * TOPK, True, score="vpu")),
    ("int8 mxu nomask+approx80", lambda: retrieve_nomask(
        pidx.packed, pidx.packed_rows, pidx.bucket_starts, N, q_i8, qb, WIN,
        TOPK, L * TOPK, True, score="mxu_i8")),
]:
    try:
        t, out = timed(fn)
        r = float(recall_at_k(out[1], true_idx))
        print(f"{name}: {t*1e3:7.1f} ms  {Q/t:8.0f} q/s  recall {r:.4f}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
