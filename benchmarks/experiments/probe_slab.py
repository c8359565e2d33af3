"""TPU probe: slab-kernel (L, window, unroll) operating points at 1M rows.

Measures the fused slab-score kernel vs the XLA packed path across
table-count/window tradeoffs (same total scored bytes) and kernel loop
unrolling, for bf16 and global-scale int8 slabs.  Findings feed the
bench defaults; see the git log for recorded results."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.io.synth import planted_clustered_corpus
from crypto_rec_tpu.models.lsh.index import build_index, pack_index, retrieve_topk, query_hashes, rerank_exact
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots, slab_topk, packed_retrieve_pallas
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync
import functools

N, D, Q, TOPK = 1_000_000, 128, 8192, 10
key = jax.random.PRNGKey(0)
t0=time.time()
corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
hard_sync(corpus); hard_sync(queries)
print(f"corpus {time.time()-t0:.1f}s", flush=True)

@functools.partial(jax.jit, static_argnames=("top_k","per_table","unroll"))
def pallas_retrieve(pidx_packed, packed_rows, bucket_starts, n_rows, queries, q_buckets, top_k, per_table, unroll):
    L = pidx_packed.shape[0]
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = bucket_starts[l_idx[None,:], q_buckets]
    end = bucket_starts[l_idx[None,:], q_buckets+1]
    size = end-start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets*golden) ^ (l_idx[None,:]*jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size-per_table,0)+1)
    sizes = jnp.minimum(end-s0, per_table)
    qv = queries.astype(jnp.float32)
    qv = qv/jnp.maximum(jnp.linalg.norm(qv,axis=1,keepdims=True),1e-30)
    dots, a0 = slab_window_dots(pidx_packed, None, s0, sizes, qv, per_table=per_table, unroll=unroll, fuse_l=False)
    return slab_topk(dots, a0, packed_rows, n_rows, top_k)

def timed(fn, reps=4):
    out=None; ts=[]
    for _ in range(reps):
        del out
        t0=time.perf_counter(); out=fn(); hard_sync(out); ts.append(time.perf_counter()-t0)
    return np.median(ts), out

import os
for (L, k, win) in [(4,11,976), (4,12,976), (5,12,780), (6,12,652)]:
    idx = build_index(jax.random.PRNGKey(1), corpus, "cosine", k, L, lsh_bucket_div=4, euclidean_h_w=1.0, use_pallas=True)
    for dname, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
        pidx = pack_index(idx, corpus, dtype=dt)
        hard_sync(jax.tree_util.tree_leaves(pidx))
        qb, _ = query_hashes(pidx, queries)
        qb = hard_sync(qb)
        # XLA baseline
        t, _ = timed(lambda: retrieve_topk(pidx, queries, corpus, top_k=TOPK, per_table=win, use_pallas=False))
        _s, ids = retrieve_topk(pidx, queries, corpus, top_k=TOPK, per_table=win, use_pallas=False)
        r = float(recall_at_k(ids, true_idx))
        print(f"L={L} k={k} win={win} {dname} XLA:    {t*1e3:7.1f} ms  {Q/t:8.0f} q/s  recall {r:.4f}", flush=True)
        for unroll in (False, True):
            core_k = 4*TOPK if dt==jnp.int8 else TOPK
            def run():
                s, ids = pallas_retrieve(pidx.packed, pidx.packed_rows, pidx.bucket_starts, pidx.n_rows, queries, qb, core_k, win, unroll)
                if dt==jnp.int8:
                    s, ids = rerank_exact(corpus, "cosine", queries, ids, TOPK)
                return s, ids
            try:
                t, out = timed(run)
                r = float(recall_at_k(out[1], true_idx))
                print(f"L={L} k={k} win={win} {dname} pal u{int(unroll)}: {t*1e3:7.1f} ms  {Q/t:8.0f} q/s  recall {r:.4f}", flush=True)
            except Exception as e:
                print(f"L={L} k={k} win={win} {dname} pal u{int(unroll)}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        del pidx
    del idx
