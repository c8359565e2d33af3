import os, time, json, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
import numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.utils.timing import hard_sync
from crypto_rec_tpu.models.lsh.index import build_index, pack_index, retrieve_topk
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.io.synth import planted_clustered_corpus

N, D, Q, TOPK = 2_000_000, 128, 8192, 10
K, L, PT = 13, 8, 488
key = jax.random.PRNGKey(0)
t0=time.perf_counter()
corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
corpus = hard_sync(corpus); queries = hard_sync(queries)
print(f"corpus {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

t0=time.perf_counter()
index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L, lsh_bucket_div=4, euclidean_h_w=1.0)
hard_sync(jax.tree_util.tree_leaves(index))
print(f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

t0=time.perf_counter()
pidx = pack_index(index, corpus, dtype=jnp.bfloat16, pad=4096)
hard_sync(jax.tree_util.tree_leaves(pidx))
print(f"pack (incl compile) {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

def timed(fn, reps=5):
    ts=[]; out=None
    for _ in range(reps):
        del out
        t0=time.perf_counter(); out=fn(); hard_sync(out)
        ts.append(time.perf_counter()-t0)
    return float(np.median(ts))

results = {}
for W in (128, 256, 512):
    for QB in (256, 1024):
        fn = lambda: retrieve_topk(pidx, queries, corpus, top_k=TOPK, per_table=PT, q_block=QB, block_rows=W)
        hard_sync(fn())
        s = timed(fn)
        _sv, ids = fn()
        rec = float(recall_at_k(ids, true_idx))
        results[f"W{W}_qb{QB}"] = {"qps": round(Q/s,1), "ms": round(s*1e3,1), "recall": round(rec,4)}
        print(f"W={W} qb={QB}: {Q/s:,.0f} q/s recall={rec:.4f}", file=sys.stderr, flush=True)
print(json.dumps(results))
