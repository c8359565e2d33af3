import time, json
import numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.utils.timing import hard_sync
from crypto_rec_tpu.models.lsh.index import build_index, candidate_ids
from crypto_rec_tpu.io.synth import planted_clustered_corpus

N, D, Q = 2_000_000, 128, 8192
corpus, queries, true_idx = planted_clustered_corpus(jax.random.PRNGKey(0), N, D, Q, 10)
corpus = hard_sync(corpus); queries = hard_sync(queries)
index = build_index(jax.random.PRNGKey(1), corpus, "cosine", 13, 8, lsh_bucket_div=4, euclidean_h_w=1.0)
hard_sync(jax.tree_util.tree_leaves(index))
fn = lambda: candidate_ids(index, queries, budget=1024, per_table=488)
hard_sync(fn())
ts = []
for _ in range(5):
    t0 = time.perf_counter(); out = fn(); hard_sync(out)
    ts.append(time.perf_counter() - t0)
s = float(np.median(ts))
from crypto_rec_tpu.ops.oracle import recall_at_k
rec = float(recall_at_k(fn(), true_idx))
print(json.dumps({"candset_qps": round(Q/s,1), "ms": round(s*1e3,1), "recall": round(rec,4)}))
