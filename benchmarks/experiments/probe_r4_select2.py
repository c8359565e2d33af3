"""Round-4 probe #2: per-table stage-1 selection.

probe_r4_select.py findings (v5e, 2026-08-21, 2M bench point):
  * kernel 43 ms for int8 AND bf16 (129 vs 244 GB/s) — iteration/VPU
    bound, not DMA bound; int8's byte advantage is invisible;
  * epilogue ~30 ms ≈ approx_max_k [8192, 5120] -> 80 alone (33-36 ms);
  * group-max pre-reduction (VERDICT-r3's lever) KILLS recall: 0.9997 ->
    0.50/0.41/0.35 at G=8/16/32.  Planted twins are ADJACENT in the same
    bucket's CSR run in EVERY table, so one G-lane group shadows all but
    one of them — co-location of near-ties is intrinsic to LSH layouts,
    so any segmented pre-max along the CSR axis is unusable.

This probe: stage 1 per TABLE-WINDOW instead of per flattened query row.
Rows within one window are distinct corpus rows, so the top-k of each
window UNIONED over L tables provably contains the global dedup top-k —
the same worst-case guarantee as the current m1 = L*k flat selection,
with selection rows of width `win` (640) instead of L*win (5120):
  D. approx_max_k on [q*L, win] -> k;
  E. exact lax.top_k on [q*L, win] -> k (narrow rows may make EXACT
     affordable — would upgrade stage 1 from approx to exact);
  F. D folded into the full pipeline (kernel + per-table stage1 + dedup).
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
    build_index, pack_index, query_hashes,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.ops.pallas.slabscore import (
    slab_window_dots, _dedup_topk_pairs,
)
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D = int(os.environ.get("BENCH_D", 128))
Q = int(os.environ.get("BENCH_Q", 8192))
K = int(os.environ.get("BENCH_LSH_K", 13))
L = int(os.environ.get("BENCH_LSH_L", 8))
PT = int(os.environ.get("BENCH_WINDOW", 488))
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


@functools.partial(jax.jit, static_argnames=("kk", "exact"))
def stage1_pertable(dots, kk, exact):
    q_, l_, w_ = dots.shape
    rows = dots.reshape(q_ * l_, w_)
    if exact:
        return jax.lax.top_k(rows, kk)
    return jax.lax.approx_max_k(rows, kk, recall_target=0.9)


@functools.partial(jax.jit, static_argnames=("kk", "exact"))
def full_pertable(packed, packed_rows, s0, sizes, qv, kk, exact):
    dots, a0 = slab_window_dots(packed, None, s0, sizes, qv,
                                per_table=PT, mask=False)
    q_, l_, w_ = dots.shape
    rows = dots.reshape(q_ * l_, w_)
    if exact:
        s1, lane = jax.lax.top_k(rows, kk)
    else:
        s1, lane = jax.lax.approx_max_k(rows, kk, recall_target=0.9)
    s1 = s1.reshape(q_, l_ * kk)
    lane = lane.reshape(q_, l_, kk)
    n_pad = packed_rows.shape[1]
    gpos = (
        jnp.arange(l_, dtype=jnp.int32)[None, :, None] * n_pad
        + jnp.minimum(a0[:, :, None] + lane, n_pad - 1)
    ).reshape(q_, l_ * kk)
    ids1 = packed_rows.reshape(-1)[gpos]
    ids1 = jnp.where(s1 > -jnp.inf, ids1, N)
    return _dedup_topk_pairs(s1, ids1, N, TOPK)


def main():
    t00 = time.perf_counter()
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        lsh_bucket_div=4, euclidean_h_w=1.0)
    hard_sync(index.bucket_starts)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    print(f"[int8] packed @{time.perf_counter()-t00:.0f}s", flush=True)

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

    dots, a0 = slab_window_dots(
        pidx.packed, None, s0, sizes, qv, per_table=PT, mask=False)
    hard_sync(dots)

    for exact in (False, True):
        tag = "exact" if exact else "approx"
        t = timed(lambda: stage1_pertable(dots, TOPK, exact))
        print(f"D/E stage1 per-table {tag} [{Q*L},{dots.shape[2]}] -> "
              f"{TOPK}: {t*1e3:.1f} ms", flush=True)

    for exact in (False, True):
        tag = "exact" if exact else "approx"
        sg, ig = full_pertable(
            pidx.packed, pidx.packed_rows, s0, sizes, qv, TOPK, exact)
        t = timed(lambda: full_pertable(
            pidx.packed, pidx.packed_rows, s0, sizes, qv, TOPK, exact))
        rec = float(recall_at_k(ig, true_idx))
        print(f"F full per-table {tag}: {t*1e3:.1f} ms "
              f"({Q/t:,.0f} q/s, recall {rec:.4f})", flush=True)
    print("done")


if __name__ == "__main__":
    main()
