"""Round-5 probe #1: decompose the CF predict tail (VERDICT r4 weak #3).

CF end-to-end at the 2M bench point runs 99.96k users/s vs 252k q/s for
retrieval at the same 32k batch — the tail (predict_scores: the [q, P, c]
neighbor-ratings gather + mean-centered einsum + top-N) has never been
profiled.  This probe times cumulatively:

  retrieve        retrieve_topk top-P=20 (stage1_width=96, the bench form)
  +gather         + neighbors.ratings[idx] ([q, P, c] f32) + mean gather
  +predict        + centered einsum + delta + where
  +topn           + topn_indices (full recommend_topk_retrieved)

then measures variants of the gather stage:
  bf16 ratings    gather from a bf16 copy (half the bytes)
  sorted gather   payload-sort ids, gather coalesced, unsort rows
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
from crypto_rec_tpu.models.lsh.index import (
    build_index, pack_index, retrieve_topk,
)
from crypto_rec_tpu.models.rec.engine import (
    RatingSet, recommend_topk_retrieved, predict_scores,
)
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


def main():
    key = jax.random.PRNGKey(0)
    corpus, queries_all, _ = planted_clustered_corpus(key, N, D, Q, 10)
    corpus = hard_sync(corpus)
    qs = hard_sync(queries_all[:Q])

    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        4, 8.0, use_pallas=True)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))

    kq = jax.random.PRNGKey(11)
    n_known = jax.random.bernoulli(kq, 0.6, (N, D))
    n_mean = jnp.sum(corpus * n_known, axis=1) / jnp.maximum(
        jnp.sum(n_known, axis=1), 1)
    nset = RatingSet(ratings=corpus, known=n_known, mean=n_mean)
    q_known = jax.random.bernoulli(jax.random.PRNGKey(12), 0.6, (Q, D))
    q_mean = jnp.sum(qs * q_known, axis=1) / jnp.maximum(
        jnp.sum(q_known, axis=1), 1)
    qset = RatingSet(ratings=qs, known=q_known, mean=q_mean)
    ratings_bf16 = hard_sync(corpus.astype(jnp.bfloat16))

    def retrieve():
        return retrieve_topk(pidx, qs, corpus, top_k=TOP_P, per_table=PT,
                             int8_rerank=False, stage1_width=96)

    @jax.jit
    def stage_gather(sims, nidx):
        valid = nidx >= 0
        idx = jnp.maximum(nidx, 0) * valid
        return nset.ratings[idx], nset.mean[idx]

    @jax.jit
    def stage_gather_bf16(sims, nidx):
        valid = nidx >= 0
        idx = jnp.maximum(nidx, 0) * valid
        return ratings_bf16[idx], nset.mean[idx]

    @jax.jit
    def stage_gather_sorted(sims, nidx):
        valid = nidx >= 0
        idx = (jnp.maximum(nidx, 0) * valid).reshape(-1)      # [q*P]
        order = jnp.argsort(idx)
        rows_sorted = nset.ratings[idx[order]]
        inv = jnp.argsort(order)
        return rows_sorted[inv].reshape(Q, TOP_P, D), nset.mean[
            idx.reshape(Q, TOP_P)]

    @jax.jit
    def stage_predict(sims, nidx):
        valid = nidx >= 0
        idx = jnp.maximum(nidx, 0) * valid
        return predict_scores(qset, nset, sims, idx, valid)

    @jax.jit
    def stage_predict_bf16(sims, nidx):
        valid = nidx >= 0
        idx = jnp.maximum(nidx, 0) * valid
        w = jnp.where(valid, sims, 0.0)
        abs_sum = jnp.sum(jnp.abs(w), axis=1)
        neigh_r = ratings_bf16[idx]
        neigh_mu = nset.mean[idx]
        centered = (neigh_r.astype(jnp.float32) - neigh_mu[:, :, None]) \
            * valid[:, :, None]
        main_sum = jnp.einsum("qp,qpc->qc", w, centered,
                              preferred_element_type=jnp.float32)
        delta = main_sum / jnp.maximum(abs_sum, 1e-30)[:, None]
        pred_unknown = qset.mean[:, None] + jnp.where(
            (abs_sum > 0.0)[:, None], delta, 0.0)
        return jnp.where(qset.known, qset.ratings, pred_unknown)

    @jax.jit
    def stage_full(sims, nidx):
        return recommend_topk_retrieved(qset, nset, sims, nidx, TOP_N)

    @jax.jit
    def stage_topn_only(pred):
        return topn_indices(pred, ~qset.known, TOP_N)

    sims, nidx = retrieve()
    sims, nidx = hard_sync(sims), hard_sync(nidx)
    pred = hard_sync(stage_predict(sims, nidx))

    t_r = timed(retrieve)
    print(f"retrieve(top{TOP_P},w96)          {t_r*1e3:8.1f} ms  "
          f"{Q/t_r:>9,.0f} q/s")
    for name, fn in [
        ("gather f32", stage_gather),
        ("gather bf16", stage_gather_bf16),
        ("gather f32 payload-sorted", stage_gather_sorted),
        ("predict f32", stage_predict),
        ("predict bf16-gather", stage_predict_bf16),
        ("full recommend (pred+topn)", stage_full),
    ]:
        hard_sync(fn(sims, nidx))
        t = timed(lambda: fn(sims, nidx))
        print(f"{name:32s} {t*1e3:8.1f} ms")
    hard_sync(stage_topn_only(pred))
    t = timed(lambda: stage_topn_only(pred))
    print(f"{'topn only':32s} {t*1e3:8.1f} ms")

    def full_e2e():
        s, i = retrieve()
        return stage_full(s, i)
    hard_sync(full_e2e())
    t = timed(full_e2e)
    print(f"{'END TO END':32s} {t*1e3:8.1f} ms  {Q/t:>9,.0f} users/s")


if __name__ == "__main__":
    main()
