"""TPU perf probe: retrieve_topk_pallas vs retrieve_topk (XLA packed) at the
bench operating point (2M x 128, L=8, window 488), planted-truth recall."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.models.lsh.index import (
    build_index, pack_index, retrieve_topk, retrieve_topk_pallas)
from crypto_rec_tpu.io.synth import planted_clustered_corpus
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync

N, D, Q, K, L, PT, TK = 2_000_000, 128, 8192, 13, 8, 488, 10
key = jax.random.PRNGKey(0)
corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TK)
corpus, queries = hard_sync(corpus), hard_sync(queries)
idx = build_index(jax.random.PRNGKey(3), corpus, "cosine", k=K, L=L,
                  lsh_bucket_div=4, euclidean_h_w=1.0)
hard_sync(jax.tree_util.tree_leaves(idx))

def timed(fn):
    out = fn(); hard_sync(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out

for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
    pidx = pack_index(idx, corpus, dtype=dtype)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    sx, outx = timed(lambda: retrieve_topk(pidx, queries, corpus, top_k=TK, per_table=PT))
    rx = float(recall_at_k(outx[1], true_idx))
    print(f"{name} XLA: {sx*1e3:.1f} ms -> {Q/sx:,.0f} q/s (recall {rx:.4f})", flush=True)
    for qt in (16, 32):
        try:
            sp, outp = timed(lambda: retrieve_topk_pallas(
                pidx, queries, corpus, top_k=TK, per_table=PT, q_tile=qt))
            rp = float(recall_at_k(outp[1], true_idx))
            match = float((np.asarray(outp[1]) == np.asarray(outx[1])).mean())
            print(f"{name} pallas qt={qt}: {sp*1e3:.1f} ms -> {Q/sp:,.0f} q/s "
                  f"(recall {rp:.4f}, id match vs XLA {match:.4f})", flush=True)
        except Exception as e:
            print(f"{name} pallas qt={qt} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    del pidx
