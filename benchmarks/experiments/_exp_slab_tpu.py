"""TPU perf probe: packed_retrieve_pallas vs packed_retrieve_core at the
bench operating point (2M x 128, L=8, window 488)."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-bench")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.models.lsh.index import build_index, pack_index, retrieve_topk, query_hashes
from crypto_rec_tpu.ops.pallas.slabscore import packed_retrieve_pallas
from crypto_rec_tpu.utils.timing import hard_sync

N, D, Q, K, L, PT, TK = 2_000_000, 128, 8192, 13, 8, 488, 10
rng = np.random.default_rng(0)
corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
queries = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
key = jax.random.PRNGKey(3)
idx = build_index(key, corpus, "cosine", k=K, L=L, lsh_bucket_div=4, euclidean_h_w=1.0)
hard_sync(jax.tree_util.tree_leaves(idx))

@functools.partial(jax.jit, static_argnames=("pt", "qt", "tk"))
def run_pallas(pidx, qs, pt, qt, tk):
    qb, _ = query_hashes(pidx, qs)
    return packed_retrieve_pallas(
        pidx.packed, pidx.packed_rows, pidx.packed_scale, pidx.bucket_starts,
        pidx.n_rows, qs, qb, tk, pt, q_tile=qt)

def run_xla(pidx, qs, pt, tk):
    # retrieve_topk streams q_block=256 so the [q, L*B, W, d] gather
    # temporary stays bounded (direct full-batch core OOMs at 8192 queries)
    return retrieve_topk(pidx, qs, corpus, top_k=tk, per_table=pt)

def timed(fn):
    out = fn(); hard_sync(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out

for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
    pidx = pack_index(idx, corpus, dtype=dtype)
    hard_sync(jax.tree_util.tree_leaves(pidx))
    sx, outx = timed(lambda: run_xla(pidx, queries, PT, TK))
    print(f"{name} XLA core: {sx*1e3:.1f} ms -> {Q/sx:,.0f} q/s", flush=True)
    for qt in (8, 16, 32):
        try:
            sp, outp = timed(lambda: run_pallas(pidx, queries, PT, qt, TK))
            match = float((np.asarray(outp[1]) == np.asarray(outx[1])).mean())
            print(f"{name} pallas qt={qt}: {sp*1e3:.1f} ms -> {Q/sp:,.0f} q/s (id match vs XLA {match:.4f})", flush=True)
        except Exception as e:
            print(f"{name} pallas qt={qt} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    del pidx
