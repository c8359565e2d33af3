"""Round-4 probe: where the euclidean index build's 27.7 s goes (2M rows,
k=5, L=10 — BENCH_r03 euclidean block; cosine builds the same corpus in
0.084 s).

Suspects, timed in isolation (each jitted, warm):
  1. hashing (chunked [n,d]x[d,L*k] matmul + floor + phi + fingerprint);
  2. the 3-key lexicographic lax.sort (bucket, fingerprint, row) x L;
  3. a packed-key variant: bucket (int64 high bits) | fingerprint-rank —
     ONE int64 key + int32 payload, num_keys=1;
  4. searchsorted for bucket starts;
  5. pack_index(augment=True) on the built index.
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
from crypto_rec_tpu.models.lsh.index import build_index, pack_index
from crypto_rec_tpu.models.lsh.pstable import PStableLsh
from crypto_rec_tpu.utils.timing import hard_sync

N = int(os.environ.get("BENCH_N", 2_000_000))
D = int(os.environ.get("BENCH_D", 128))
K = int(os.environ.get("BENCH_EUC_K", 5))
L = int(os.environ.get("BENCH_EUC_L", 10))
W = float(os.environ.get("BENCH_EUC_W", 10.0))


def timed(fn, reps=3):
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
    corpus, _q, _t = planted_clustered_corpus(key, N, D, 16, 10)
    corpus = hard_sync(corpus)
    n_buckets = max(1, N // 4)
    fam = PStableLsh.create(jax.random.PRNGKey(21), D, K, L, W)

    chunk = 1 << 18

    @jax.jit
    def hash_all(x):
        def hash_chunk(xc):
            h = fam.hash_values(xc)
            return jnp.stack(
                [fam.bucket_ids_from_hashes(h, n_buckets),
                 fam.fingerprints_from_hashes(h)], axis=1)
        pad = (-N) % chunk
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        out = jax.lax.map(hash_chunk, xp.reshape(-1, chunk, D))
        return out.reshape(xp.shape[0], 2, L)[:N]

    both = hash_all(corpus)
    t_hash = timed(lambda: hash_all(corpus))
    print(f"1 hash+phi+fp [{N}, {L}]: {t_hash:.2f}s")
    bucket_ids = both[:, 0, :]      # [n, L]
    detailed = both[:, 1, :]        # [n, L]

    iota = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def sort3(b, fp):
        def one(bl, fl):
            sb, _, order = jax.lax.sort((bl, fl, iota), num_keys=2)
            starts = jnp.searchsorted(
                sb, jnp.arange(n_buckets + 1, dtype=sb.dtype), side="left"
            ).astype(jnp.int32)
            return order, starts
        return jax.vmap(one)(b.T, fp.T)

    r3 = sort3(bucket_ids, detailed)
    t_sort3 = timed(lambda: sort3(bucket_ids, detailed))
    print(f"2 3-key lex sort x{L}: {t_sort3:.2f}s")

    @jax.jit
    def sort_packed(b, fp):
        # one int64 key: bucket << 32 | (fp biased to unsigned order) —
        # fingerprint comparisons in _fp_run_starts are SIGNED int32, so
        # bias by 2^31 to keep the same order in the unsigned low bits
        def one(bl, fl):
            key = (bl.astype(jnp.int64) << 32) | (
                fl.astype(jnp.int64) + jnp.int64(2**31))
            sk, order = jax.lax.sort((key, iota), num_keys=1)
            sb = (sk >> 32).astype(jnp.int32)
            starts = jnp.searchsorted(
                sb, jnp.arange(n_buckets + 1, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)
            return order, starts
        return jax.vmap(one)(b.T, fp.T)

    rp = sort_packed(bucket_ids, detailed)
    t_sp = timed(lambda: sort_packed(bucket_ids, detailed))
    print(f"3 packed-int64 sort x{L}: {t_sp:.2f}s")
    # parity: same permutation wherever (bucket, fp) pairs are unique
    same = bool(jnp.all(r3[0] == rp[0]))
    print(f"  permutation identical: {same}")

    @jax.jit
    def starts_only(b):
        def one(bl):
            sb = jax.lax.sort(bl)
            return jnp.searchsorted(
                sb, jnp.arange(n_buckets + 1, dtype=bl.dtype), side="left")
        return jax.vmap(one)(b.T)

    t_ss = timed(lambda: starts_only(bucket_ids))
    print(f"4 single-key sort + searchsorted x{L}: {t_ss:.2f}s")

    # 5: whole build + pack as shipped
    t0 = time.perf_counter()
    eidx = build_index(jax.random.PRNGKey(21), corpus, "euclidean", K, L,
                       lsh_bucket_div=4, euclidean_h_w=W)
    hard_sync(jax.tree_util.tree_leaves(eidx))
    print(f"5 full build_index cold: {time.perf_counter() - t0:.2f}s")
    t_build = timed(
        lambda: build_index(jax.random.PRNGKey(21), corpus, "euclidean", K,
                            L, lsh_bucket_div=4, euclidean_h_w=W), reps=3)
    print(f"5 full build_index warm: {t_build:.2f}s")
    t0 = time.perf_counter()
    pidx = pack_index(eidx, corpus, dtype=jnp.int8, augment=True)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    print(f"6 pack_index(augment, int8) cold: {time.perf_counter() - t0:.2f}s")
    del pidx
    t_pack = timed(
        lambda: pack_index(eidx, corpus, dtype=jnp.int8, augment=True),
        reps=3)
    print(f"6 pack_index warm: {t_pack:.2f}s")
    print("done")


if __name__ == "__main__":
    main()
