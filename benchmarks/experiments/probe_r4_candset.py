"""Round-4 probe: unfreeze the candidate-SET engine (12.3k q/s for three
rounds — BENCH_r01..r03 candidate_set_qps).

candidate_ids' per-query cost is two wide sorts over the [L*W] gathered
window ids (the id-sort for dedup + the f32 composite-key argsort for the
count-ranked truncation).  Candidates measured here, at the 2M bench
point (q=8192, L=8, W=488, budget=1024):

  A. current candidate_ids (baseline);
  B. packed-key variant: the count-rank argsort replaced by a single
     int32 sort of (L-cnt)<<12 | position — position within the id-sorted
     array IS the id-ascending tiebreak, so one int32 key carries the
     whole composite order and the payload gather;
  C. scored-survivor sets: slab_window_dots (the fused kernel, ~9 ms for
     the whole batch) + approx_max_k over [q, L*win] to keep the top
     ~1.25*budget lanes BY SCORE, then one narrow id-sort dedup — the
     candidate set becomes score-truncated instead of count-truncated
     (a strictly better truncation rule) and the wide sorts shrink ~3x.

Downstream quality gate: candidate-set recall@10 vs the planted truth
must hold at the round-3 level (0.9993).
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
    build_index, pack_index, candidate_ids, query_hashes,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D = int(os.environ.get("BENCH_D", 128))
Q = int(os.environ.get("BENCH_Q", 8192))
K = int(os.environ.get("BENCH_LSH_K", 13))
L = int(os.environ.get("BENCH_LSH_L", 8))
PT = int(os.environ.get("BENCH_WINDOW", 488))
BUDGET = int(os.environ.get("BENCH_BUDGET", 1024))
TOPK = 10


def timed(fn, reps=5):
    out, times = None, []
    for _ in range(reps):
        del out
        t0 = time.perf_counter()
        out = fn()
        hard_sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def cand_recall(ids, true_idx):
    """recall@TOPK of the planted neighbors inside the candidate SET."""
    hit = (ids[:, None, :] == true_idx[:, :, None]).any(axis=2)
    return float(jnp.mean(hit.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("budget",))
def cand_ids_packedkey(index, queries, budget):
    """Variant B: same gather + id-sort, single-int32-key rank select."""
    from crypto_rec_tpu.models.lsh.index import gather_candidate_ids

    q_buckets, _ = query_hashes(index, queries)
    sentinel = index.n_rows
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = index.bucket_starts[l_idx[None, :], q_buckets]
    end = index.bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    roff = jnp.remainder(jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
    base = start + roff
    offs = base[:, :, None] + jnp.arange(PT, dtype=jnp.int32)[None, None, :]
    valid = offs < end[:, :, None]
    rows = index.sorted_rows[
        l_idx[None, :, None], jnp.minimum(offs, index.n_rows - 1)]
    ids = jnp.where(valid, rows, sentinel).reshape(Q, L * PT)

    m = ids.shape[1]
    s = jnp.sort(ids, axis=1)
    iota = jnp.arange(m, dtype=jnp.int32)[None, :]
    first = jnp.concatenate(
        [jnp.ones((Q, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    last = jnp.concatenate(
        [s[:, :-1] != s[:, 1:], jnp.ones((Q, 1), bool)], axis=1)
    run_start = jax.lax.cummax(jnp.where(first, iota, 0), axis=1)
    run_end = jax.lax.cummin(
        jnp.where(last, iota, m - 1), axis=1, reverse=True)
    cnt = run_end - run_start + 1
    valid_first = first & (s != sentinel)
    # one int32 composite: count desc (high bits), id asc via the sorted
    # position (low bits); invalid lanes sort last
    key = jnp.where(valid_first, ((L - cnt) << 16) | iota, jnp.int32(2**30))
    ksel = jnp.sort(key, axis=1)[:, :budget]
    pos = ksel & 0xFFFF
    out = jnp.where(ksel < 2**30, jnp.take_along_axis(s, pos, axis=1), -1)
    return out


@functools.partial(jax.jit, static_argnames=("overselect",))
def cand_ids_scored(packed, packed_rows, s0, sizes, qv, overselect):
        """Variant C: kernel dots -> approx top lanes by score -> dedup.
        Slab arrays are ARGUMENTS (closure capture would embed them as
        2 GB XLA constants — see probe_r4_select.py)."""
        dots, a0 = slab_window_dots(
            packed, None, s0, sizes, qv, per_table=PT, mask=False)
        q_, l_, w_ = dots.shape
        flat = dots.reshape(q_, l_ * w_)
        m1 = min(overselect, l_ * w_)  # noqa
        s1, pos1 = jax.lax.approx_max_k(flat, m1, recall_target=0.9)
        l_of = pos1 // w_
        lane = pos1 % w_
        n_pad = packed_rows.shape[1]
        a0_ = jnp.take_along_axis(a0, l_of, axis=1)
        gpos = l_of * n_pad + jnp.minimum(a0_ + lane, n_pad - 1)
        ids1 = packed_rows.reshape(-1)[gpos]
        ids1 = jnp.where(s1 > -jnp.inf, ids1, N)
        # dedup: sort by id, keep first occurrences, score-rank to budget
        order = jnp.argsort(ids1, axis=1)
        ids_s = jnp.take_along_axis(ids1, order, axis=1)
        sc_s = jnp.take_along_axis(s1, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((q_, 1), bool), ids_s[:, 1:] == ids_s[:, :-1]],
            axis=1)
        sc_s = jnp.where(dup | (ids_s >= N), -jnp.inf, sc_s)
        s2, pos2 = jax.lax.top_k(sc_s, min(BUDGET, m1))
        out = jnp.where(
            s2 > -jnp.inf, jnp.take_along_axis(ids_s, pos2, axis=1), -1)
        return out


def main():
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        lsh_bucket_div=4, euclidean_h_w=1.0)
    hard_sync(index.bucket_starts)

    # A: baseline
    run_a = lambda: candidate_ids(index, queries, budget=BUDGET, per_table=PT)
    ids_a = run_a()
    t_a = timed(run_a)
    rec_a = cand_recall(ids_a, true_idx)
    print(f"A current candidate_ids: {t_a*1e3:.1f} ms "
          f"({Q/t_a:,.0f} q/s, set-recall {rec_a:.4f})")

    # B: packed-key
    run_b = lambda: cand_ids_packedkey(index, queries, BUDGET)
    ids_b = run_b()
    t_b = timed(run_b)
    rec_b = cand_recall(ids_b, true_idx)
    print(f"B packed-key rank: {t_b*1e3:.1f} ms "
          f"({Q/t_b:,.0f} q/s, set-recall {rec_b:.4f})")

    # C: scored survivors (int8 slabs)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    q_buckets, _ = query_hashes(pidx, queries)
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = pidx.bucket_starts[l_idx[None, :], q_buckets]
    end = pidx.bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
    sizes = jnp.minimum(end - s0, PT)
    qv = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)

    for oversel in (1280, 1536, 2048):
        ids_c = cand_ids_scored(
            pidx.packed, pidx.packed_rows, s0, sizes, qv, oversel)
        t_c = timed(lambda: cand_ids_scored(
            pidx.packed, pidx.packed_rows, s0, sizes, qv, oversel))
        rec_c = cand_recall(ids_c, true_idx)
        nuniq = float(jnp.mean(jnp.sum(ids_c >= 0, axis=1)))
        print(f"C scored oversel={oversel}: {t_c*1e3:.1f} ms "
              f"({Q/t_c:,.0f} q/s, set-recall {rec_c:.4f}, "
              f"avg set size {nuniq:.0f})")
    print("done")


if __name__ == "__main__":
    main()
