"""Round-4 probe: euclidean w/L at small table counts.

The 10M euclidean point (L=4, w=10, window 1024) measured recall 0.9296:
clustered corpora put whole cluster cores into the SAME k-tuple cell, so
the exact-fingerprint run exceeds the window and sampling drops planted
twins.  Smaller w splits those runs (the twins sit ~1e-3 apart — far
inside any cell), trading nothing at the planted scale.  This probe
sweeps w at L=4/5 on 2M rows using candidate-set recall of the CSR
windows (the quantity window truncation caps), which predicts the packed
path's recall without paying a pack per point.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")

from crypto_rec_tpu.io.synth import planted_clustered_corpus
from crypto_rec_tpu.models.lsh.index import build_index, candidate_ids
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D = 128
Q = 1024
K = int(os.environ.get("BENCH_EUC_K", 5))
WIN = int(os.environ.get("BENCH_WINDOW", 1024))
TOPK = 10


def set_recall(ids, true_idx):
    hit = (ids[:, None, :] == true_idx[:, :, None]).any(axis=2)
    return float(jnp.mean(hit.astype(jnp.float32)))


def main():
    print(f"devices: {jax.devices()}  N={N}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    Ls = [int(v) for v in os.environ.get("PROBE_L", "4,5").split(",")]
    Ws = [float(v) for v in os.environ.get("PROBE_W", "2,4,6,10").split(",")]
    for L in Ls:
        for w in Ws:
            t0 = time.perf_counter()
            idx = build_index(jax.random.PRNGKey(21), corpus, "euclidean",
                              K, L, lsh_bucket_div=4, euclidean_h_w=w)
            hard_sync(idx.bucket_starts)
            ids = candidate_ids(idx, queries, budget=WIN, per_table=WIN)
            rec = set_recall(ids, true_idx)
            print(f"L={L} w={w}: window set-recall@10 = {rec:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
            del idx, ids
    print("done")


if __name__ == "__main__":
    main()
