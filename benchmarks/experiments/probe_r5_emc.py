"""Round-5 probe #6: euclidean MultiCube operating point.

The single euclidean cube plateaus at 0.8080 recall (w=8, 64 probes) —
vertex truncation, the same structural ceiling the cosine MultiCube
broke.  C independent augmented-slab cubes make both kinds of miss
(confident-bit flips AND window truncation) quasi-independent, so the
union should clear 0.95 where one cube cannot.  Sweep (C, w, probes)
at the 2M bench point, recall vs euclidean planted truth.

Env: BENCH_N, PROBE_GRID "C:w:probes:per_probe,..." override.
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
from crypto_rec_tpu.models.lsh.hypercube import (
    build_multicube, multicube_retrieve_topk,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D, Q, TOPK = 128, 32768, 10


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
    corpus, queries_all, true_idx_all = planted_clustered_corpus(
        key, N, D, Q, TOPK)
    corpus = hard_sync(corpus)
    qs = hard_sync(queries_all[:Q])
    true_idx = true_idx_all[:Q]

    grid = os.environ.get(
        "PROBE_GRID",
        "2:8:32:976,2:8:16:976,2:12:32:976,3:8:16:976,2:8:32:488")
    built = {}
    for cell in grid.split(","):
        C, w, probes, pp = cell.split(":")
        C, w, probes, pp = int(C), float(w), int(probes), int(pp)
        bk = (C, w)
        if bk not in built:
            t0 = time.perf_counter()
            mc = build_multicube(
                jax.random.PRNGKey(7), corpus, "euclidean", C, 13, w,
                corpus_dtype=jnp.int8)
            hard_sync(jax.tree_util.tree_leaves(mc))
            print(f"[C={C} w={w}] build+pack {time.perf_counter()-t0:.1f}s",
                  flush=True)
            built = {bk: mc}   # keep ONE resident (2 segments ~ 1 GB each)
        mc = built[bk]
        run = lambda: multicube_retrieve_topk(
            mc, qs, top_k=TOPK, probes=probes, per_probe=pp)
        try:
            hard_sync(run())
        except Exception as e:
            print(f"  C={C} w={w} probes={probes} pp={pp}: "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        t = timed(run)
        _s, ids = run()
        rec = float(recall_at_k(ids, true_idx))
        print(f"  C={C} w={w} probes={probes}/cube pp={pp}: {t*1e3:7.1f} ms "
              f"{Q/t:>9,.0f} q/s recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
