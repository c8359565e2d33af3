"""Profile build_index stages at 2M x 128 (cosine, k=13, L=8)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from crypto_rec_tpu.utils.timing import hard_sync
from crypto_rec_tpu.models.lsh.hyperplane import CosineLsh
from crypto_rec_tpu.models.lsh.index import _csr_from_buckets, build_index

N, D, K, L = 2_000_000, 128, 13, 8
key = jax.random.PRNGKey(0)
corpus = hard_sync(jax.random.normal(key, (N, D), jnp.float32))
fam = CosineLsh.create(jax.random.PRNGKey(1), D, K, L)


def timed(fn, reps=3):
    out = fn()
    hard_sync(jax.tree_util.tree_leaves(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        hard_sync(jax.tree_util.tree_leaves(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


@jax.jit
def hash_chunked(x):
    chunk = 1 << 18
    pad = (-N) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    return jax.lax.map(fam.bucket_ids, xp.reshape(-1, chunk, D)).reshape(-1, L)[:N]


@jax.jit
def hash_flat(x):
    return fam.bucket_ids(x)


@jax.jit
def csr(b):
    return _csr_from_buckets(b, 1 << K)


t, bids = timed(lambda: hash_chunked(corpus))
print(f"hash (chunked lax.map): {t:.3f}s")
t2, _ = timed(lambda: hash_flat(corpus))
print(f"hash (flat matmul)    : {t2:.3f}s")
t3, _ = timed(lambda: csr(bids))
print(f"csr sort+searchsorted : {t3:.3f}s")
t4, _ = timed(lambda: build_index(
    jax.random.PRNGKey(1), corpus, "cosine", K, L,
    lsh_bucket_div=4, euclidean_h_w=1.0))
print(f"full build_index      : {t4:.3f}s")
