"""Round-4 probe #5: decompose the 32k-batch epilogue.

At q=32768 the per-table full path walls ~190 ms: ~25 ms dispatch +
~48 ms kernel + ~20 ms expected stage-1 — leaving ~90 ms unattributed.
This probe times the pipeline cumulatively (kernel; +stage1; +id gather;
+dedup) at the 2M int8 bench point to find where it hides.
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
from crypto_rec_tpu.ops.pallas.slabscore import (
    slab_window_dots, _dedup_topk_pairs,
)
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D, Q, K, L, PT, TOPK = 128, 32768, 13, 8, 488, 10


def timed(fn, reps=5):
    out, times = None, []
    for _ in range(reps):
        del out
        t0 = time.perf_counter()
        out = fn()
        hard_sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@functools.partial(jax.jit, static_argnames=("stage",))
def pipeline(packed, packed_rows, s0, sizes, qv, stage):
    dots, a0 = slab_window_dots(packed, None, s0, sizes, qv,
                                per_table=PT, mask=False)
    if stage == "kernel":
        return dots
    q_, l_, w_ = dots.shape
    rows = dots.reshape(q_ * l_, w_)
    s1, lane = jax.lax.approx_max_k(rows, TOPK, recall_target=0.9)
    if stage == "stage1":
        return s1
    s1 = s1.reshape(q_, l_ * TOPK)
    lane = lane.reshape(q_, l_, TOPK)
    n_pad = packed_rows.shape[1]
    gpos = (
        jnp.arange(l_, dtype=jnp.int32)[None, :, None] * n_pad
        + jnp.minimum(a0[:, :, None] + lane, n_pad - 1)
    ).reshape(q_, l_ * TOPK)
    ids1 = packed_rows.reshape(-1)[gpos]
    ids1 = jnp.where(s1 > -jnp.inf, ids1, N)
    if stage == "gather":
        return ids1
    return _dedup_topk_pairs(s1, ids1, N, TOPK)


def main():
    t00 = time.perf_counter()
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        lsh_bucket_div=4, euclidean_h_w=1.0)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    print(f"packed @{time.perf_counter()-t00:.0f}s", flush=True)

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
    s0, sizes, qv = hard_sync((s0, sizes, qv))

    prev = 0.0
    for stage in ("kernel", "stage1", "gather", "full"):
        t = timed(lambda: pipeline(
            pidx.packed, pidx.packed_rows, s0, sizes, qv, stage))
        print(f"{stage}: {t*1e3:.1f} ms (delta {1e3*(t-prev):+.1f} ms)",
              flush=True)
        prev = t
    print("done")


if __name__ == "__main__":
    main()
