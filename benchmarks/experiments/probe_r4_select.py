"""Round-4 probe: the selection epilogue after the slab kernel.

Round-3 finding (ops/pallas/slabscore.py cost model): the kernel itself
streams at ~75% of the v5e HBM roof, but end-to-end the 2M bench point
moves ~10-17% — the approx_max_k stage-1 over the [q, L*win] dots plus
the ~24 ms fixed dispatch eat the difference, and int8's half-bytes buy
only 4% over bf16.

This probe times every stage in isolation at the exact 2M bench shapes
and measures the VERDICT-r3 lever: an XLA segmented pre-reduction
(group-max over G consecutive lanes, argmax lane kept in a side array)
that shrinks the approx_max_k input G-fold.  A true top-k row can only
be lost if ALL its L window copies are shadowed by a strictly better row
in their G-lane group — measured below via planted recall.

NOTE: every jitted stage takes the slab arrays as ARGUMENTS — a closure
capture turns the 2 GB slabs into embedded XLA constants, and on this
testbed's remote tunnel that serializes the whole index per compile
(first probe attempt burned 20 minutes exactly that way).
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
Q = int(os.environ.get("BENCH_Q", 8192))
K = int(os.environ.get("BENCH_LSH_K", 13))
L = int(os.environ.get("BENCH_LSH_L", 8))
PT = int(os.environ.get("BENCH_WINDOW", 488))
TOPK = 10
M1 = L * TOPK


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
def full_current(packed, packed_rows, s0, sizes, qv):
    d_, a_ = slab_window_dots(packed, None, s0, sizes, qv,
                              per_table=PT, mask=False)
    return slab_topk(d_, a_, packed_rows, N, TOPK, exact=False)


@jax.jit
def stage1_approx(dots):
    flat = dots.reshape(Q, -1)
    return jax.lax.approx_max_k(flat, M1, recall_target=0.9)


@functools.partial(jax.jit, static_argnames=("g",))
def grouped(packed, packed_rows, s0, sizes, qv, g):
    d_, a_ = slab_window_dots(packed, None, s0, sizes, qv,
                              per_table=PT, mask=False)
    q_, l_, w_ = d_.shape
    gr = d_.reshape(q_, l_ * w_ // g, g)
    gmax = jnp.max(gr, axis=2)
    garg = jnp.argmax(gr, axis=2).astype(jnp.int32)
    s1, gpos = jax.lax.approx_max_k(gmax, M1, recall_target=0.9)
    lane_in = jnp.take_along_axis(garg, gpos, axis=1)
    pos1 = gpos * g + lane_in              # lane in [L*win]
    l_of = pos1 // w_
    lane = pos1 % w_
    a0_ = jnp.take_along_axis(a_, l_of, axis=1)
    n_pad = packed_rows.shape[1]
    gp = l_of * n_pad + jnp.minimum(a0_ + lane, n_pad - 1)
    ids1 = packed_rows.reshape(-1)[gp]
    ids1 = jnp.where(s1 > -jnp.inf, ids1, N)
    return _dedup_topk_pairs(s1, ids1, N, TOPK)


def main():
    t00 = time.perf_counter()
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    print(f"corpus built @{time.perf_counter()-t00:.0f}s", flush=True)
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        lsh_bucket_div=4, euclidean_h_w=1.0)
    hard_sync(index.bucket_starts)
    print(f"index built @{time.perf_counter()-t00:.0f}s", flush=True)

    dtypes = os.environ.get("PROBE_DTYPES", "int8,bfloat16").split(",")
    pidx = None
    for dtype_name in dtypes:
        dtype = {"int8": jnp.int8, "bfloat16": jnp.bfloat16}[dtype_name]
        del pidx
        pidx = pack_index(index, corpus, dtype=dtype)
        hard_sync(jax.tree_util.tree_leaves(pidx))
        print(f"[{dtype_name}] packed @{time.perf_counter()-t00:.0f}s",
              flush=True)

        q_buckets, _ = query_hashes(pidx, queries)
        l_idx = jnp.arange(L, dtype=jnp.int32)
        start = pidx.bucket_starts[l_idx[None, :], q_buckets]
        end = pidx.bucket_starts[l_idx[None, :], q_buckets + 1]
        size = end - start
        golden = jnp.int32(-1640531527)
        mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
        s0 = start + jnp.remainder(
            jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
        sizes = jnp.minimum(end - s0, PT)
        qv = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)

        # ---- stage A: kernel alone (slab_window_dots is itself jitted) ----
        dots, a0 = slab_window_dots(
            pidx.packed, None, s0, sizes, qv, per_table=PT, mask=False)
        t_kernel = timed(lambda: slab_window_dots(
            pidx.packed, None, s0, sizes, qv, per_table=PT, mask=False))
        win = dots.shape[2]
        slab_gb = Q * L * win * D * jnp.dtype(dtype).itemsize / 1e9
        dots_gb = Q * L * win * 4 / 1e9
        print(f"[{dtype_name}] kernel dots [{Q},{L},{win}]: "
              f"{t_kernel*1e3:.1f} ms  ({slab_gb:.1f} GB slabs + "
              f"{dots_gb:.1f} GB dots out -> "
              f"{(slab_gb + dots_gb)/t_kernel:.0f} GB/s)", flush=True)

        # ---- stage B: current full path ----
        s_cur, i_cur = full_current(
            pidx.packed, pidx.packed_rows, s0, sizes, qv)
        t_full = timed(lambda: full_current(
            pidx.packed, pidx.packed_rows, s0, sizes, qv))
        rec = float(recall_at_k(i_cur, true_idx))
        print(f"[{dtype_name}] current full: {t_full*1e3:.1f} ms "
              f"({Q/t_full:,.0f} q/s, recall {rec:.4f}) "
              f"-> epilogue = {1e3*(t_full - t_kernel):.1f} ms", flush=True)

        # ---- stage1 in isolation on resident dots ----
        t_s1 = timed(lambda: stage1_approx(dots))
        print(f"[{dtype_name}]   stage1 approx_max_k [{Q},{L*win}] -> "
              f"{M1}: {t_s1*1e3:.1f} ms", flush=True)

        # ---- variant C: group-max pre-reduce ----
        for G in (8, 16, 32):
            sg, ig = grouped(pidx.packed, pidx.packed_rows, s0, sizes, qv, G)
            t_g = timed(lambda: grouped(
                pidx.packed, pidx.packed_rows, s0, sizes, qv, G))
            rec_g = float(recall_at_k(ig, true_idx))
            print(f"[{dtype_name}]   group-max G={G}: {t_g*1e3:.1f} ms "
                  f"({Q/t_g:,.0f} q/s, recall {rec_g:.4f})", flush=True)

        del dots
    print("done")


if __name__ == "__main__":
    main()
