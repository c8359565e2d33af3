"""Round-4 probe: hypercube operating point at the >= 0.95 recall bar.

BENCH_r03's only cube point was 54.8k q/s at recall 0.9474 — under the
BASELINE.md north star.  Round-3 sweep knowledge: recall comes from WIDE
windows over the near vertices, not many probes.  Here: probes x window
frontier at the 2M point on the fused shared-slab kernel path
(probes % 8 == 0), bf16 slabs.
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
D = int(os.environ.get("BENCH_D", 128))
Q = int(os.environ.get("BENCH_Q", 8192))
CK = int(os.environ.get("BENCH_CUBE_K", 13))
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


def main():
    t00 = time.perf_counter()
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus, queries, true_idx = planted_clustered_corpus(key, N, D, Q, TOPK)
    corpus, queries = hard_sync(corpus), hard_sync(queries)
    cube = build_hypercube(jax.random.PRNGKey(7), corpus, "cosine", CK, 1.0)
    cube = pack_cube(cube, corpus, dtype=jnp.bfloat16)
    hard_sync(jax.tree_util.tree_leaves(cube))
    print(f"cube built+packed @{time.perf_counter()-t00:.0f}s", flush=True)

    for probes, pt in ((32, 976), (48, 976), (64, 976), (32, 1536),
                       (48, 1280), (64, 640)):
        try:
            run = lambda: cube_retrieve_topk(
                cube, queries, corpus, top_k=TOPK, probes=probes,
                per_probe=pt, approx_stage1=True)
            _s, ids = run()
            hard_sync(ids)
            t = timed(run)
            rec = float(recall_at_k(ids, true_idx))
            print(f"probes={probes} window={pt}: {t*1e3:.1f} ms "
                  f"({Q/t:,.0f} q/s, recall {rec:.4f})", flush=True)
        except Exception as e:
            print(f"probes={probes} window={pt}: FAILED {type(e).__name__}: "
                  f"{e}", flush=True)
    print("done")


if __name__ == "__main__":
    main()
