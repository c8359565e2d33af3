import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
import numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.models.lsh.index import build_index, pack_index
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_scores
from crypto_rec_tpu.utils.timing import hard_sync

N, D, Q, K, L, PT = 2_000_000, 128, 8192, 13, 8, 488
rng = np.random.default_rng(0)
corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
queries = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
key = jax.random.PRNGKey(3)
idx = build_index(key, corpus, "cosine", k=K, L=L, lsh_bucket_div=4, euclidean_h_w=1.0)
hard_sync(jax.tree_util.tree_leaves(idx))

@functools.partial(jax.jit, static_argnames=("pt", "qt"))
def run(pidx, qs, pt, qt):
    qn = qs / jnp.maximum(jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
    qb = pidx.family.bucket_ids(qs)
    L_ = pidx.packed.shape[0]
    l_idx = jnp.arange(L_, dtype=jnp.int32)
    start = pidx.bucket_starts[l_idx[None, :], qb]
    end = pidx.bucket_starts[l_idx[None, :], qb + 1]
    size = end - start
    golden = jnp.int32(-1640531527)
    mix = (qb * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(jnp.abs(mix), jnp.maximum(size - pt, 0) + 1)
    sizes = jnp.minimum(end - s0, pt)
    return slab_window_scores(pidx.packed, pidx.packed_rows, pidx.packed_scale,
                              s0, sizes, qn, per_table=pt, q_tile=qt)

def timed(fn):
    out = fn(); hard_sync(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
    pidx = pack_index(idx, corpus, dtype=dtype)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    for qt in (8, 16):
        try:
            s = timed(lambda: run(pidx, queries, PT, qt))
            print(f"{name} kernel qt={qt}: {s*1e3:.1f} ms -> {Q/s:,.0f} q/s (dots+ids only)", flush=True)
        except Exception as e:
            print(f"{name} qt={qt} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    del pidx
