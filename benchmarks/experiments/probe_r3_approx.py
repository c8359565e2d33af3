"""TPU probe (round 3c): stage-1 candidate selection cost.

jax.lax.top_k lowers to a full variadic sort on TPU (measured ~134-177 ms
at the 2M bench shapes regardless of k or per-table splitting) — the whole
epilogue bottleneck.  jax.lax.approx_max_k is the TPU-native partial
reduction; this probe measures it as the stage-1 selector plus the exact
dedup stage 2, for bf16 (k=10) and int8-overfetch (k=40) shapes.
"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
import time, functools, numpy as np, jax, jax.numpy as jnp
from crypto_rec_tpu.utils.timing import hard_sync

Q, L, WIN = 8192, 8, 640
dots = jax.random.normal(jax.random.PRNGKey(0), (Q, L, WIN), jnp.float32)
dots = hard_sync(dots)


def timed(fn, reps=5):
    out = None; ts = []
    for _ in range(reps):
        del out
        t0 = time.perf_counter(); out = fn(); hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


for k in (10, 40):
    m1 = L * k
    f = jax.jit(lambda d, m1=m1: jax.lax.top_k(d.reshape(Q, -1), m1))
    t, _ = timed(lambda: f(dots))
    print(f"top_k global m1={m1}:        {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
    g = jax.jit(lambda d, k=k: jax.lax.top_k(d, k))
    t, _ = timed(lambda: g(dots))
    print(f"top_k per-table k={k}:       {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
    for rt in (0.95, 0.99):
        h = jax.jit(functools.partial(
            lambda d, m1, rt: jax.lax.approx_max_k(
                d.reshape(Q, -1), m1, recall_target=rt),
            m1=m1, rt=rt))
        t, _ = timed(lambda: h(dots))
        print(f"approx_max_k m1={m1} rt={rt}: {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
    # full stage1+2: approx stage1, gather ids, dedup (argsort m1) + top_k k
    rows = jax.random.randint(jax.random.PRNGKey(1), (L, 2048 * 1024), 0, 1 << 21)
    a0 = jax.random.randint(jax.random.PRNGKey(2), (Q, L), 0, 2048 * 1024 - WIN)

    @functools.partial(jax.jit, static_argnames=("m1", "k"))
    def full(d, rows, a0, m1, k):
        n_pad = rows.shape[1]
        s1, pos1 = jax.lax.approx_max_k(d.reshape(Q, -1), m1, recall_target=0.95)
        l_of = pos1 // WIN
        lane = pos1 % WIN
        a = jnp.take_along_axis(a0, l_of, axis=1)
        gpos = l_of * n_pad + jnp.minimum(a + lane, n_pad - 1)
        ids1 = rows.reshape(-1)[gpos]
        order = jnp.argsort(ids1, axis=1)
        ids_s = jnp.take_along_axis(ids1, order, axis=1)
        s_s = jnp.take_along_axis(s1, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((Q, 1), bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=1)
        s_s = jnp.where(dup, -jnp.inf, s_s)
        s2, pos2 = jax.lax.top_k(s_s, k)
        return s2, jnp.take_along_axis(ids_s, pos2, axis=1)

    t, _ = timed(lambda: full(dots, rows, a0, m1, k))
    print(f"approx stage1+dedup k={k}:   {t*1e3:7.1f} ms  {Q/t:8.0f} q/s", flush=True)
