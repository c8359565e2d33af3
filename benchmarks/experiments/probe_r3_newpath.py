"""TPU probe (round 3): new in-kernel-masked fused kernel + per-table
stage-1 top-k epilogue, bf16 and global-scale int8, nbuf/q_tile sweep,
plus an isolated rerank_exact cost check for the int8 over-fetch."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, functools, numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.models.lsh.index import (
    build_index, pack_index, query_hashes, rerank_exact)
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots, slab_topk
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("PROBE_N", 2_000_000))
D, Q, TOPK = 128, 8192, 10
L, K, WIN = 8, 13, 488

corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
queries = jax.random.normal(jax.random.PRNGKey(7), (Q, D), jnp.float32)
hard_sync(corpus); hard_sync(queries)
idx = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                  lsh_bucket_div=4, euclidean_h_w=1.0, use_pallas=True)
print("index ready", flush=True)


def timed(fn, reps=5):
    out = None; ts = []
    for _ in range(reps):
        del out
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


@functools.partial(jax.jit, static_argnames=("top_k", "per_table", "q_tile", "nbuf"))
def retrieve(packed, packed_rows, bucket_starts, n_rows, queries, q_buckets,
             top_k, per_table, q_tile, nbuf):
    Lx = packed.shape[0]
    l_idx = jnp.arange(Lx, dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1)
    sizes = jnp.minimum(end - s0, per_table)
    qv = queries / jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    dots, a0 = slab_window_dots(packed, None, s0, sizes, qv,
                                per_table=per_table, q_tile=q_tile, nbuf=nbuf)
    return slab_topk(dots, a0, packed_rows, n_rows, top_k)


for dname, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
    pidx = pack_index(idx, corpus, dtype=dt)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    qb, _ = query_hashes(pidx, queries)
    qb = hard_sync(qb)
    core_k = 4 * TOPK if dt == jnp.int8 else TOPK
    for qt in (16, 32):
        for nbuf in (3, 4, 6):
            t, out = timed(lambda: retrieve(
                pidx.packed, pidx.packed_rows, pidx.bucket_starts, N,
                queries, qb, core_k, WIN, qt, nbuf))
            print(f"{dname} kern+topk(core_k={core_k}) qt={qt} nbuf={nbuf}: "
                  f"{t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
    # int8: add exact rerank stage, and try smaller over-fetch
    if dt == jnp.int8:
        for ck in (20, 40):
            def run():
                s, ids = retrieve(pidx.packed, pidx.packed_rows,
                                  pidx.bucket_starts, N, queries, qb, ck, WIN, 16, 4)
                return rerank_exact(corpus, "cosine", queries, ids, TOPK)
            t, _ = timed(run)
            print(f"int8 + rerank core_k={ck}: {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
        # rerank alone
        s, ids = retrieve(pidx.packed, pidx.packed_rows, pidx.bucket_starts,
                          N, queries, qb, 40, WIN, 16, 4)
        ids = hard_sync(ids)
        rr = jax.jit(functools.partial(rerank_exact, metric="cosine", top_k=TOPK))
        t, _ = timed(lambda: rr(corpus, queries=queries, ids=ids))
        print(f"rerank_exact alone (m=40): {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
    del pidx
