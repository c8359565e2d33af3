"""Round-5 probe #3: move the default euclidean bench point to the
sweep-optimal regime (VERDICT r4 weak #2).

Round-4 default: k=5 L=10 w=10 window=768 -> 42.8k q/s at 0.9986.  The
round-3 w-sweep (d81a6b8) found the collision-limited regime wants wider
cells and fewer tables (w=20-28, L=4); the 10M run at w=20/L=4 hit 80.9k.
Sweep (L, w, window) at 2M with augmented int8 slabs on the kernel, plus
the scored candidate-set leg (candidate_ids_scored euclidean, new this
round)."""

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
    build_index, pack_index, retrieve_topk, candidate_ids_scored,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D, Q, TOPK, E_K = 128, 32768, 10, 5


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
    corpus, queries_all, true_all = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus = hard_sync(corpus)
    qs = hard_sync(queries_all[:Q])
    true_idx = true_all[:Q]

    grid = os.environ.get(
        "PROBE_GRID", "4:16:512,4:20:512,4:20:768,4:24:512,6:20:512")
    for cell in grid.split(","):
        L, w, pt = cell.split(":")
        L, w, pt = int(L), float(w), int(pt)
        eidx = build_index(
            jax.random.PRNGKey(21), corpus, "euclidean", E_K, L,
            lsh_bucket_div=4, euclidean_h_w=w, use_pallas=False,
        )
        eidx = pack_index(eidx, corpus, dtype=jnp.int8, augment=True)
        hard_sync(jax.tree_util.tree_leaves(eidx))
        run = lambda: retrieve_topk(
            eidx, qs, corpus, top_k=TOPK, per_table=pt,
            approx_stage1=True, int8_rerank=False,
        )
        try:
            hard_sync(run())
        except Exception as e:
            print(f"L={L} w={w} pt={pt}: {type(e).__name__}", flush=True)
            del eidx
            continue
        t = timed(run)
        _s, ids = run()
        rec = float(recall_at_k(ids, true_idx))
        print(f"euclid L={L} w={w:5.1f} pt={pt}: {t*1e3:8.1f} ms  "
              f"{Q/t:>9,.0f} q/s  recall {rec:.4f}", flush=True)
        # scored candidate sets on the same index (round-5 extension)
        try:
            run_sc = lambda: candidate_ids_scored(
                eidx, qs, budget=256, per_table=pt)
            hard_sync(run_sc())
            t_sc = timed(run_sc)
            sc_rec = float(recall_at_k(run_sc(), true_idx))
            print(f"  scored sets: {t_sc*1e3:8.1f} ms  "
                  f"{Q/t_sc:>9,.0f} sets/s  set-recall {sc_rec:.4f}",
                  flush=True)
        except Exception as e:
            print(f"  scored sets: {type(e).__name__} {e}", flush=True)
        del eidx


if __name__ == "__main__":
    main()
