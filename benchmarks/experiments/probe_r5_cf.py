"""Round-5 probe #1: decompose the CF predict tail (VERDICT r4 weak #3).

CF end-to-end at the 2M bench point runs 99.96k users/s vs 252k q/s for
retrieval at the same 32k batch.  First finding (2026-08-21): top-P=20
retrieval alone is 303 ms (108k q/s) — 2.3x the top-10 retrieval — so the
predict tail is NOT the main gap; the top-20 stage-1 selection is.  This
probe times (a) retrieval variants at top-20 (flat stage1_width=96 vs
per-table stage1_per_table kk), (b) the predict tail stages.

All jitted stages take arrays as ARGUMENTS — a closure-captured corpus
would be serialized into the HLO and shipped to this testbed's remote
compile service (measured: a [q,P] gather with a 1 GB captured constant
sat >15 min in compile; as an argument it compiles in seconds).
"""

from __future__ import annotations

import functools
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
from crypto_rec_tpu.models.lsh.index import (
    build_index, pack_index, retrieve_topk,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.ops.topk import topn_indices
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D, Q, K, L, PT = 128, 32768, 13, 8, 488
TOP_P, TOP_N = 20, 5


def timed(fn, reps=5):
    out, times = None, []
    for _ in range(reps):
        del out
        t0 = time.perf_counter()
        out = fn()
        hard_sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@functools.partial(jax.jit, static_argnames=("mode",))
def predict_tail(nr, nm, q_r, q_known, q_mean, sims, nidx, mode):
    valid = nidx >= 0
    idx = jnp.maximum(nidx, 0) * valid
    if mode == "gather":
        return nr[idx], nm[idx]
    w = jnp.where(valid, sims, 0.0)
    abs_sum = jnp.sum(jnp.abs(w), axis=1)
    neigh_r = nr[idx]
    neigh_mu = nm[idx]
    centered = (neigh_r.astype(jnp.float32) - neigh_mu[:, :, None]) \
        * valid[:, :, None]
    main_sum = jnp.einsum("qp,qpc->qc", w, centered,
                          preferred_element_type=jnp.float32)
    delta = main_sum / jnp.maximum(abs_sum, 1e-30)[:, None]
    pred_unknown = q_mean[:, None] + jnp.where(
        (abs_sum > 0.0)[:, None], delta, 0.0)
    pred = jnp.where(q_known, q_r, pred_unknown)
    if mode == "predict":
        return pred
    return pred, topn_indices(pred, ~q_known, TOP_N)


def main():
    key = jax.random.PRNGKey(0)
    corpus, queries_all, true_all = planted_clustered_corpus(key, N, D, Q, 10)
    corpus = hard_sync(corpus)
    qs = hard_sync(queries_all[:Q])
    true_idx = true_all[:Q]

    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        4, 8.0, use_pallas=True)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    print("index packed", flush=True)

    kq = jax.random.PRNGKey(11)
    n_known = jax.random.bernoulli(kq, 0.6, (N, D))
    n_mean = jnp.sum(corpus * n_known, axis=1) / jnp.maximum(
        jnp.sum(n_known, axis=1), 1)
    q_known = jax.random.bernoulli(jax.random.PRNGKey(12), 0.6, (Q, D))
    q_mean = jnp.sum(qs * q_known, axis=1) / jnp.maximum(
        jnp.sum(q_known, axis=1), 1)
    nr_bf16 = hard_sync(corpus.astype(jnp.bfloat16))
    del n_known

    # ---- (a) top-20 retrieval variants ----
    variants = [
        ("flat w96", dict(stage1_width=96)),
        ("per-table kk=20", dict()),
        ("per-table kk=12", dict(stage1_per_table=12)),
        ("per-table kk=8", dict(stage1_per_table=8)),
        ("per-table kk=4", dict(stage1_per_table=4)),
    ]
    best = None
    for name, kw in variants:
        run = lambda: retrieve_topk(
            pidx, qs, corpus, top_k=TOP_P, per_table=PT,
            int8_rerank=False, **kw)
        try:
            hard_sync(run())
        except Exception as e:
            print(f"retrieve {name}: {type(e).__name__} {e}", flush=True)
            continue
        t = timed(run)
        sims, nidx = run()
        rec = float(recall_at_k(jnp.asarray(nidx)[:, :10], true_idx))
        print(f"retrieve top{TOP_P} {name:18s} {t*1e3:8.1f} ms  "
              f"{Q/t:>9,.0f} q/s  nrec@10 {rec:.4f}", flush=True)
        if best is None or t < best[1]:
            best = (name, t, kw)

    sims, nidx = hard_sync(retrieve_topk(
        pidx, qs, corpus, top_k=TOP_P, per_table=PT,
        int8_rerank=False, **best[2]))

    # ---- (b) predict tail stages ----
    for mode in ("gather", "predict", "full"):
        run = lambda: predict_tail(
            corpus, n_mean, qs, q_known, q_mean, sims, nidx, mode)
        hard_sync(run())
        t = timed(run)
        print(f"tail f32 {mode:10s} {t*1e3:8.1f} ms", flush=True)
    run = lambda: predict_tail(
        nr_bf16, n_mean, qs, q_known, q_mean, sims, nidx, "full")
    hard_sync(run())
    t = timed(run)
    print(f"tail bf16 full      {t*1e3:8.1f} ms", flush=True)

    # ---- end to end at the best retrieval variant ----
    def e2e():
        s, i = retrieve_topk(
            pidx, qs, corpus, top_k=TOP_P, per_table=PT,
            int8_rerank=False, **best[2])
        return predict_tail(corpus, n_mean, qs, q_known, q_mean, s, i, "full")
    hard_sync(e2e())
    t = timed(e2e)
    print(f"END TO END [{best[0]}]  {t*1e3:8.1f} ms  {Q/t:>9,.0f} users/s",
          flush=True)


if __name__ == "__main__":
    main()
