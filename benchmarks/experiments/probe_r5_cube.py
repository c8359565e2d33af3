"""Round-5 probe #2: hypercube frontier with query-directed probing.

Round-4 cube headline: 0.9626 recall at 42.3k q/s (k=13, 48 Hamming
probes) — the worst leg.  Directed probing (directed_probe_vertices)
spends the same probe budget on the margin-likeliest vertices.  Sweep
(probes, per_probe, k) x {directed, hamming} at the 2M bench point, plus
a euclidean-cube datapoint (VERDICT r4 missing #3).

Env: BENCH_N, PROBE_METRIC (cosine|euclidean|both), PROBE_GRID override.
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
    build_hypercube, pack_cube, cube_retrieve_topk,
)
from crypto_rec_tpu.ops.oracle import recall_at_k
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D, Q, TOPK = 128, 32768, 10
METRICS = {
    "cosine": ["cosine"], "euclidean": ["euclidean"],
    "both": ["cosine", "euclidean"],
}[os.environ.get("PROBE_METRIC", "both")]


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

    for metric in METRICS:
        for CK in (13, 14):
            c_dtype = jnp.int8 if metric == "euclidean" else jnp.bfloat16
            t0 = time.perf_counter()
            cube = build_hypercube(
                jax.random.PRNGKey(7), corpus, metric, CK, 8.0)
            cube = pack_cube(cube, corpus, dtype=c_dtype)
            hard_sync(jax.tree_util.tree_leaves(cube))
            print(f"[{metric} k={CK}] build+pack "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            grid = os.environ.get("PROBE_GRID", "16:976,32:976,48:976,32:488")
            for cell in grid.split(","):
                probes, pp = (int(v) for v in cell.split(":"))
                for directed in (True, False):
                    run = lambda: cube_retrieve_topk(
                        cube, qs, corpus, top_k=TOPK, probes=probes,
                        per_probe=pp, approx_stage1=True, directed=directed,
                    )
                    try:
                        hard_sync(run())
                    except Exception as e:
                        print(f"  probes={probes} pp={pp} "
                              f"dir={directed}: {type(e).__name__}", flush=True)
                        continue
                    t = timed(run)
                    _s, ids = run()
                    rec = float(recall_at_k(ids, true_idx))
                    print(f"  [{metric} k={CK}] probes={probes} pp={pp} "
                          f"directed={int(directed)}: {t*1e3:7.1f} ms "
                          f"{Q/t:>9,.0f} q/s recall {rec:.4f}", flush=True)
            del cube


if __name__ == "__main__":
    main()
