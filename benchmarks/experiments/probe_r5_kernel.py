"""Round-5 probe #4: kernel bandwidth (VERDICT r4 weak #4).

At the 2M bench point the fused kernel streams ~165 GB/s (~20% of v5e
HBM).  Sweep the DMA pipeline depth (nbuf) and query tile (q_tile) on
the RAW kernel (slab_window_dots only, epilogue excluded) and report
achieved GB/s; also time the kernel+stage1 pair to see how much of any
kernel win survives the epilogue."""

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
    build_index, pack_index, query_hashes,
)
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_dots, slab_topk
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D, Q, K, L, PT = 128, 32768, 13, 8, 488


def timed(fn, reps=5):
    out, ts = None, []
    for _ in range(reps):
        del out
        t0 = time.perf_counter()
        out = fn()
        hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    key = jax.random.PRNGKey(0)
    corpus, qa, _ = planted_clustered_corpus(key, N, D, Q, 10)
    corpus = hard_sync(corpus)
    qs = hard_sync(qa[:Q])
    index = build_index(jax.random.PRNGKey(1), corpus, "cosine", K, L,
                        4, 8.0, use_pallas=True)
    pidx = pack_index(index, corpus, dtype=jnp.int8)
    hard_sync(jax.tree_util.tree_leaves(pidx))

    qb, _ = query_hashes(pidx, qs)
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = pidx.bucket_starts[l_idx[None, :], qb]
    end = pidx.bucket_starts[l_idx[None, :], qb + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (qb * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - PT, 0) + 1)
    sizes = jnp.minimum(end - s0, PT)
    qv = qs / jnp.maximum(jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
    s0, sizes, qv = hard_sync(s0), hard_sync(sizes), hard_sync(qv)

    win = (PT + 32 + 127) // 128 * 128
    slab_gb = Q * L * win * D * 1 / 1e9  # int8 bytes DMA'd
    print(f"window {win} lanes; {slab_gb:.1f} GB slab reads per batch",
          flush=True)

    import functools

    @functools.partial(jax.jit, static_argnames=("q_tile", "nbuf"))
    def kernel_only(packed, s0_, sizes_, qv_, q_tile, nbuf):
        dots, a0 = slab_window_dots(
            packed, None, s0_, sizes_, qv_, per_table=PT,
            q_tile=q_tile, nbuf=nbuf, mask=False,
        )
        # reduce to tiny output so the [q, L, win] f32 dots write-back
        # (21 GB!) is excluded from what we sync — NOTE: XLA cannot elide
        # the write since dots is the kernel output; this still measures
        # kernel + dots write.
        return dots[:, 0, :8], a0

    for q_tile in (16, 32):
        for nbuf in (4, 8, 12):
            run = lambda: kernel_only(pidx.packed, s0, sizes, qv,
                                      q_tile, nbuf)
            try:
                hard_sync(run())
            except Exception as e:
                print(f"q_tile={q_tile} nbuf={nbuf}: {type(e).__name__}",
                      flush=True)
                continue
            t = timed(run)
            print(f"q_tile={q_tile} nbuf={nbuf}: {t*1e3:8.1f} ms  "
                  f"{Q/t:>9,.0f} q/s  {slab_gb/t:6.1f} GB/s slab",
                  flush=True)

    @functools.partial(jax.jit, static_argnames=("q_tile", "nbuf", "kk"))
    def kernel_stage1(packed, prows, s0_, sizes_, qv_, q_tile, nbuf, kk):
        dots, a0 = slab_window_dots(
            packed, None, s0_, sizes_, qv_, per_table=PT,
            q_tile=q_tile, nbuf=nbuf, mask=False,
        )
        return slab_topk(dots, a0, prows, N, 10, exact=False,
                         stage1_per_table=kk)

    for q_tile, nbuf in ((16, 4), (16, 8), (32, 8)):
        run = lambda: kernel_stage1(pidx.packed, pidx.packed_rows, s0,
                                    sizes, qv, q_tile, nbuf, 10)
        try:
            hard_sync(run())
        except Exception as e:
            print(f"full q_tile={q_tile} nbuf={nbuf}: {type(e).__name__}",
                  flush=True)
            continue
        t = timed(run)
        print(f"full q_tile={q_tile} nbuf={nbuf}: {t*1e3:8.1f} ms  "
              f"{Q/t:>9,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
