"""Benchmark: LSH retrieval recall@10 + queries/s/chip on synthetic
embeddings (BASELINE.json config 3: single-chip batched LSH vs exact NN).

Prints exactly ONE JSON line:
  {"metric": "lsh_recall@10", "value": <recall>, "unit": "recall",
   "vs_baseline": <recall / 0.95>, ...extra diagnostics...}

The baseline target is recall@10 >= 0.95 vs exact NN (BASELINE.md); the
reference itself publishes no numbers (its oracle functions are never called
by main — /root/reference/lib/utils.hpp:107-140), so vs_baseline is measured
against that target.

Timing methodology: every jitted path is warmed up (compile excluded), and
each timed repetition ends with a scalar host read so asynchronous dispatch
(and the remote-execution tunnel on this testbed) cannot under-report.

Environment knobs: BENCH_N (corpus rows, default 2,000,000), BENCH_D (dims),
BENCH_Q (queries), BENCH_ORACLE_Q (queries for the exact-NN recall check),
BENCH_LSH_K (default auto: buckets sized so the per-table gather window
covers an average bucket), BENCH_LSH_L, BENCH_BUDGET.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, reps: int = 5):
    """Median wall-clock of fn(), forcing a host sync per rep."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        # scalar host read defeats async dispatch under-reporting
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    N = int(os.environ.get("BENCH_N", 2_000_000))
    D = int(os.environ.get("BENCH_D", 128))
    Q = int(os.environ.get("BENCH_Q", 8192))
    OQ = int(os.environ.get("BENCH_ORACLE_Q", 1024))
    L = int(os.environ.get("BENCH_LSH_L", 8))
    BUDGET = int(os.environ.get("BENCH_BUDGET", 1024))
    # Auto-size k: one bit below "average bucket == budget/L" — slightly
    # larger buckets raise the per-table collision probability, and the 4x
    # window below still covers them (CPU sweep 2026-08-17: this operating
    # point gives recall ~0.99 at 1M rows vs ~0.96 for auto k).
    k_auto = max(8, math.ceil(math.log2(max(2, N / max(1, BUDGET // L)))) - 1)
    K = int(os.environ.get("BENCH_LSH_K", k_auto))
    # Per-table gather window: ~4x the average bucket covers hot buckets.
    pt_auto = min(BUDGET, max(128, 4 * N // (1 << K)))
    PT = int(os.environ.get("BENCH_WINDOW", pt_auto))
    TOPK = 10

    from crypto_rec_tpu.models.lsh.index import (
        build_index,
        candidate_ids,
        retrieve_topk,
    )
    from crypto_rec_tpu.ops.oracle import exact_nearest, recall_at_k

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}  N={N} D={D} Q={Q} "
        f"K={K} L={L} budget={BUDGET} window={PT}")
    key = jax.random.PRNGKey(0)

    # Clustered synthetic corpus (LSH shines on structured data; pure
    # isotropic noise has no neighbors to find).  Centers scale with N so a
    # cluster stays ~128 points — thousands of near-duplicates per center
    # would turn the top-10 task into budget-bound needle-picking among
    # equidistant rows, which no ANN structure (or real corpus) exhibits.
    kc, kp, kq, kb = jax.random.split(key, 4)
    n_centers = max(1024, N // 128)
    centers = jax.random.normal(kc, (n_centers, D), jnp.float32) * 2.0
    t0 = time.perf_counter()
    assign = jax.random.randint(kp, (N,), 0, n_centers)
    corpus = centers[assign] + 0.3 * jax.random.normal(kq, (N, D), jnp.float32)
    corpus = jax.block_until_ready(corpus)
    log(f"corpus [{N}, {D}] built in {time.perf_counter() - t0:.1f}s")

    queries = corpus[:Q] + 0.05 * jax.random.normal(kb, (Q, D), jnp.float32)
    queries = jax.block_until_ready(queries)

    # ---- index build: warm (compile) then timed ----
    def do_build(seed):
        return build_index(
            jax.random.PRNGKey(seed), corpus, "cosine", K, L,
            lsh_bucket_div=4, euclidean_h_w=1.0,
        )

    t0 = time.perf_counter()
    index = do_build(1)
    jax.block_until_ready(index.bucket_starts)
    log(f"index build cold (incl. compile): {time.perf_counter() - t0:.2f}s")
    build_s = timed(lambda: jax.block_until_ready(do_build(1).bucket_starts), reps=3)
    log(f"index build warm: {build_s:.3f}s ({N / build_s / 1e6:.2f}M rows/s)")

    # ---- retrieval QPS ----
    jax.block_until_ready(candidate_ids(index, queries, budget=BUDGET, per_table=PT))  # warm
    query_s = timed(lambda: candidate_ids(index, queries, budget=BUDGET, per_table=PT), reps=5)
    qps = Q / query_s
    log(f"retrieval: {Q} queries in {query_s * 1e3:.1f} ms -> {qps:,.0f} q/s/chip")

    # ---- fused end-to-end retrieval (gather + score + top-k) ----
    jax.block_until_ready(
        retrieve_topk(index, queries, corpus, top_k=TOPK, per_table=PT)
    )
    fused_s = timed(
        lambda: retrieve_topk(index, queries, corpus, top_k=TOPK, per_table=PT),
        reps=5,
    )
    fused_qps = Q / fused_s
    log(f"fused retrieve+score+top{TOPK}: {fused_s * 1e3:.1f} ms -> "
        f"{fused_qps:,.0f} q/s/chip")

    # ---- recall vs exact oracle on a subsample ----
    ids = candidate_ids(index, queries, budget=BUDGET, per_table=PT)
    _s_f, ids_f = retrieve_topk(index, queries, corpus, top_k=TOPK, per_table=PT)
    t0 = time.perf_counter()
    _d, true_idx = exact_nearest(queries[:OQ], corpus, "cosine", TOPK, block_rows=128)
    jax.block_until_ready(true_idx)
    log(f"exact oracle over {OQ} x {N}: {time.perf_counter() - t0:.1f}s")
    recall = float(recall_at_k(ids[:OQ], true_idx))
    fused_recall = float(recall_at_k(ids_f[:OQ], true_idx))
    log(f"recall@{TOPK} = {recall:.4f} (budget={BUDGET}); "
        f"fused top-{TOPK} recall = {fused_recall:.4f}")

    print(json.dumps({
        "metric": "lsh_recall@10",
        "value": round(recall, 4),
        "unit": "recall",
        "vs_baseline": round(recall / 0.95, 4),
        "qps_per_chip": round(fused_qps, 1),
        "candidate_set_qps": round(qps, 1),
        "fused_recall": round(fused_recall, 4),
        "index_build_s": round(build_s, 3),
        "index_rows_per_s": round(N / build_s, 1),
        "corpus_rows": N,
        "dim": D,
        "lsh_k": K,
        "lsh_tables": L,
        "candidate_budget": BUDGET,
        "per_table_window": PT,
        "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
