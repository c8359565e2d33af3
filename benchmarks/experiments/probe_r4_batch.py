"""Round-4 probe #3: fixed dispatch overhead + batch scaling.

probe_r4_select2.py: per-table stage-1 lifts 112k -> 124k q/s at
q=8192.  Every timed number on this testbed carries a fixed
dispatch+sync cost (README r3 estimated ~24 ms); this probe measures it
directly (a trivial jitted op through the same harness) and records the
batch-scaling curve of the full fused path (current flat stage-1 vs
per-table stage-1) at q = 8192 / 16384 / 32768 — the operating-envelope
evidence VERDICT r3 asked to put in the driver JSON.
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
    slab_window_dots, slab_topk, _dedup_topk_pairs,
)
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D = int(os.environ.get("BENCH_D", 128))
QMAX = 32768
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


@jax.jit
def noop(x):
    return x + 1.0


@functools.partial(jax.jit, static_argnames=("pertable",))
def full(packed, packed_rows, s0, sizes, qv, pertable):
    dots, a0 = slab_window_dots(packed, None, s0, sizes, qv,
                                per_table=PT, mask=False)
    if not pertable:
        return slab_topk(dots, a0, packed_rows, N, TOPK, exact=False)
    q_, l_, w_ = dots.shape
    rows = dots.reshape(q_ * l_, w_)
    s1, lane = jax.lax.approx_max_k(rows, TOPK, recall_target=0.9)
    s1 = s1.reshape(q_, l_ * TOPK)
    lane = lane.reshape(q_, l_, TOPK)
    n_pad = packed_rows.shape[1]
    gpos = (
        jnp.arange(l_, dtype=jnp.int32)[None, :, None] * n_pad
        + jnp.minimum(a0[:, :, None] + lane, n_pad - 1)
    ).reshape(q_, l_ * TOPK)
    ids1 = packed_rows.reshape(-1)[gpos]
    ids1 = jnp.where(s1 > -jnp.inf, ids1, N)
    return _dedup_topk_pairs(s1, ids1, N, TOPK)


def main():
    t00 = time.perf_counter()
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(
        key, N, D, QMAX, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        lsh_bucket_div=4, euclidean_h_w=1.0)
    hard_sync(index.bucket_starts)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    print(f"[int8] packed @{time.perf_counter()-t00:.0f}s", flush=True)

    x = jnp.ones((8,), jnp.float32)
    hard_sync(noop(x))
    t_noop = timed(lambda: noop(x), reps=9)
    print(f"dispatch+sync floor (trivial jitted op): {t_noop*1e3:.1f} ms",
          flush=True)

    q_buckets_all, _ = query_hashes(pidx, queries)
    l_idx = jnp.arange(L, dtype=jnp.int32)
    for q in (8192, 16384, 32768):
        qb = q_buckets_all[:q]
        start = pidx.bucket_starts[l_idx[None, :], qb]
        end = pidx.bucket_starts[l_idx[None, :], qb + 1]
        size = end - start
        golden = jnp.int32(-1640531527)
        mix = (qb * golden) ^ (l_idx[None, :] * jnp.int32(40503))
        s0 = start + jnp.remainder(
            jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
        sizes = jnp.minimum(end - s0, PT)
        qs = queries[:q]
        qv = qs / jnp.maximum(
            jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
        s0, sizes, qv = hard_sync((s0, sizes, qv))
        for pertable in (False, True):
            tag = "per-table" if pertable else "flat"
            sg, ig = full(pidx.packed, pidx.packed_rows, s0, sizes, qv,
                          pertable)
            t = timed(lambda: full(
                pidx.packed, pidx.packed_rows, s0, sizes, qv, pertable))
            rec = float(recall_at_k(ig, true_idx[:q]))
            print(f"q={q} {tag}: {t*1e3:.1f} ms ({q/t:,.0f} q/s, "
                  f"recall {rec:.4f}; minus-dispatch "
                  f"{q/(t - t_noop):,.0f} q/s)", flush=True)
    print("done")


if __name__ == "__main__":
    main()
