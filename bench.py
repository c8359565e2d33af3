"""Benchmark: sharded-LSH retrieval recall@10 + queries/s/chip on synthetic
embeddings (BASELINE.json config 3: single-chip batched LSH vs exact NN).

Prints exactly ONE JSON line:
  {"metric": "lsh_recall@10", "value": <recall>, "unit": "recall",
   "vs_baseline": <recall / 0.95>, ...extra diagnostics...}

The baseline target is recall@10 >= 0.95 vs exact NN (BASELINE.md); the
reference itself publishes no numbers (its oracle functions are never called
by main — /root/reference/lib/utils.hpp:107-140), so vs_baseline is measured
against that target.

Environment knobs: BENCH_N (corpus rows, default 2,000,000), BENCH_D (dims,
default 128), BENCH_Q (queries, default 8192), BENCH_ORACLE_Q (queries used
for the exact-NN recall check, default 1024).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    N = int(os.environ.get("BENCH_N", 2_000_000))
    D = int(os.environ.get("BENCH_D", 128))
    Q = int(os.environ.get("BENCH_Q", 8192))
    OQ = int(os.environ.get("BENCH_ORACLE_Q", 1024))
    K = int(os.environ.get("BENCH_LSH_K", 10))
    L = int(os.environ.get("BENCH_LSH_L", 8))
    BUDGET = int(os.environ.get("BENCH_BUDGET", 1024))
    TOPK = 10

    from crypto_rec_tpu.models.lsh.index import build_index, candidate_ids
    from crypto_rec_tpu.ops.oracle import exact_nearest, recall_at_k

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    key = jax.random.PRNGKey(0)

    # Clustered synthetic corpus (LSH shines on structured data; pure
    # isotropic noise has no neighbors to find).
    kc, kp, kq, kb = jax.random.split(key, 4)
    n_centers = 1024
    centers = jax.random.normal(kc, (n_centers, D), jnp.float32) * 2.0
    t0 = time.perf_counter()
    assign = jax.random.randint(kp, (N,), 0, n_centers)
    corpus = centers[assign] + 0.3 * jax.random.normal(kq, (N, D), jnp.float32)
    corpus = jax.block_until_ready(corpus)
    log(f"corpus [{N}, {D}] built in {time.perf_counter() - t0:.1f}s")

    queries = corpus[:Q] + 0.05 * jax.random.normal(kb, (Q, D), jnp.float32)
    queries = jax.block_until_ready(queries)

    # ---- index build ----
    t0 = time.perf_counter()
    index = build_index(
        jax.random.PRNGKey(1), corpus, "cosine", K, L,
        lsh_bucket_div=4, euclidean_h_w=1.0,
    )
    jax.block_until_ready(index.bucket_starts)
    build_s = time.perf_counter() - t0
    log(f"index build ({L} tables x 2^{K} buckets): {build_s:.2f}s "
        f"({N / build_s / 1e6:.2f}M rows/s)")

    # ---- query warm-up + timed run ----
    ids = candidate_ids(index, queries, budget=BUDGET)
    jax.block_until_ready(ids)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        ids = candidate_ids(index, queries, budget=BUDGET)
    jax.block_until_ready(ids)
    query_s = (time.perf_counter() - t0) / reps
    qps = Q / query_s
    log(f"retrieval: {Q} queries in {query_s * 1e3:.1f} ms -> {qps:,.0f} q/s/chip")

    # ---- recall vs exact oracle on a subsample ----
    t0 = time.perf_counter()
    _d, true_idx = exact_nearest(queries[:OQ], corpus, "cosine", TOPK, block_rows=128)
    jax.block_until_ready(true_idx)
    log(f"exact oracle over {OQ} x {N}: {time.perf_counter() - t0:.1f}s")
    recall = float(recall_at_k(ids[:OQ], true_idx))
    log(f"recall@{TOPK} = {recall:.4f} (budget={BUDGET})")

    print(json.dumps({
        "metric": "lsh_recall@10",
        "value": round(recall, 4),
        "unit": "recall",
        "vs_baseline": round(recall / 0.95, 4),
        "qps_per_chip": round(qps, 1),
        "index_build_s": round(build_s, 3),
        "corpus_rows": N,
        "dim": D,
        "candidate_budget": BUDGET,
        "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
