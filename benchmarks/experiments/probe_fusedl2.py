"""TPU probe #2 for the fused-L kernel: operating points (L, k, win) on the
recall-vs-qps frontier, and the q_tile grid knob.  Run after probe_fusedl
settled fuse_l=True; findings feed the bench defaults."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, functools, numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.io.synth import planted_clustered_corpus
from crypto_rec_tpu.models.lsh.index import (
    build_index, pack_index, query_hashes)
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots, slab_topk
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("PROBE_N", 2_000_000))
D, Q, TOPK = 128, 8192, 10
corpus, queries, true_idx = planted_clustered_corpus(
    jax.random.PRNGKey(0), N, D, Q, TOPK)
hard_sync(corpus); hard_sync(queries)
print(f"corpus ready N={N}", flush=True)


@functools.partial(jax.jit, static_argnames=("top_k", "per_table", "q_tile"))
def pallas_retrieve(packed, packed_rows, bucket_starts, n_rows, queries,
                    q_buckets, top_k, per_table, q_tile):
    L = packed.shape[0]
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1)
    sizes = jnp.minimum(end - s0, per_table)
    qv = queries.astype(jnp.float32)
    qv = qv / jnp.maximum(jnp.linalg.norm(qv, axis=1, keepdims=True), 1e-30)
    dots, a0 = slab_window_dots(packed, None, s0, sizes, qv,
                                per_table=per_table, q_tile=q_tile)
    return slab_topk(dots, a0, packed_rows, n_rows, TOPK)


def timed(fn, reps=5):
    out = None; ts = []
    for _ in range(reps):
        del out
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


POINTS = [(8, 13, 488), (6, 13, 488), (6, 12, 652), (4, 13, 976), (4, 12, 976)]
for (L, k, win) in POINTS:
    idx = build_index(jax.random.PRNGKey(1), corpus, "cosine", k, L,
                      lsh_bucket_div=4, euclidean_h_w=1.0, use_pallas=True)
    pidx = pack_index(idx, corpus, dtype=jnp.bfloat16)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    qb, _ = query_hashes(pidx, queries)
    qb = hard_sync(qb)
    tiles = (16, 32, 64) if (L, k, win) == (8, 13, 488) else (16,)
    for qt in tiles:
        def run():
            return pallas_retrieve(pidx.packed, pidx.packed_rows,
                                   pidx.bucket_starts, pidx.n_rows,
                                   queries, qb, TOPK, win, qt)
        try:
            t, out = timed(run)
            r = float(recall_at_k(out[1], true_idx))
            print(f"L={L} k={k} win={win} qt={qt}: {t*1e3:7.1f} ms "
                  f"{Q/t:8.0f} q/s  recall {r:.4f}", flush=True)
        except Exception as e:
            print(f"L={L} k={k} win={win} qt={qt}: FAIL "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)
    del pidx, idx
