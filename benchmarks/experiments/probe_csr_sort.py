"""Experiment: cheapest way to build CSR (sort rows by bucket) on TPU.

Candidates over [L=8, n=2M] int32 bucket ids (k=13 -> 8192 buckets):
  A. current: vmapped stable jnp.argsort + gather sorted_b
  B. vmapped lax.sort((b, iota), num_keys=1)  (unstable, sorted_b free)
  C. int64 packed single-key sort: (b << 21) | iota
  D. two-level: chunked local sort + per-chunk histogram + global scatter
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

N = 1 << 21
L = 8
NB = 1 << 13

key = jax.random.PRNGKey(0)
b = jax.random.randint(key, (L, N), 0, NB, dtype=jnp.int32)
b = jax.device_put(b)


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return x


def timed(fn, reps=3):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


@jax.jit
def method_a(b):
    def one(bl):
        order = jnp.argsort(bl)
        sorted_b = bl[order]
        starts = jnp.searchsorted(
            sorted_b, jnp.arange(NB + 1, dtype=bl.dtype), side="left"
        ).astype(jnp.int32)
        return order.astype(jnp.int32), starts
    return jax.vmap(one)(b)


@jax.jit
def method_b(b):
    iota = jnp.arange(N, dtype=jnp.int32)
    def one(bl):
        sorted_b, order = jax.lax.sort((bl, iota), num_keys=1)
        starts = jnp.searchsorted(
            sorted_b, jnp.arange(NB + 1, dtype=bl.dtype), side="left"
        ).astype(jnp.int32)
        return order, starts
    return jax.vmap(one)(b)


@jax.jit
def method_c(b):
    iota = jnp.arange(N, dtype=jnp.int64)
    def one(bl):
        packed = (bl.astype(jnp.int64) << 21) | iota
        s = jax.lax.sort(packed)
        order = (s & ((1 << 21) - 1)).astype(jnp.int32)
        sorted_b = (s >> 21).astype(jnp.int32)
        starts = jnp.searchsorted(
            sorted_b, jnp.arange(NB + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return order, starts
    return jax.vmap(one)(b)


CH = 1 << 14  # chunk size for two-level


@jax.jit
def method_d(b):
    nch = N // CH

    def one(bl):
        blc = bl.reshape(nch, CH)
        iota = jnp.arange(CH, dtype=jnp.int32)
        sb, so = jax.vmap(lambda x: jax.lax.sort((x, iota), num_keys=1))(blc)
        # per-chunk bucket starts: [nch, NB+1]
        edges = jnp.arange(NB + 1, dtype=jnp.int32)
        lst = jax.vmap(lambda s: jnp.searchsorted(s, edges, side="left"))(sb)
        cnt = (lst[:, 1:] - lst[:, :-1]).astype(jnp.int32)      # [nch, NB]
        # global slot base for (chunk, bucket): bucket-major exclusive scan
        base = jnp.cumsum(cnt.T.reshape(-1)) - cnt.T.reshape(-1)  # [NB*nch]
        base = base.reshape(NB, nch).T                            # [nch, NB]
        # slot of element (c, j): base[c, sb[c,j]] + (j - lst[c, sb[c,j]])
        j = jnp.broadcast_to(iota[None, :], (nch, CH))
        slot = jnp.take_along_axis(base, sb, axis=1) + j - jnp.take_along_axis(
            lst[:, :-1], sb, axis=1
        )
        rows = jnp.zeros((N,), jnp.int32).at[slot.reshape(-1)].set(
            (so + (jnp.arange(nch, dtype=jnp.int32) * CH)[:, None]).reshape(-1),
            unique_indices=True, mode="drop",
        )
        starts = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(jnp.sum(cnt, axis=0)).astype(jnp.int32),
        ])
        return rows, starts
    return jax.vmap(one)(b)


ra = timed(lambda: method_a(b))
print("A current argsort:", round(ra[0], 3), "s")
rb = timed(lambda: method_b(b))
print("B lax.sort pair  :", round(rb[0], 3), "s")
rc = timed(lambda: method_c(b))
print("C int64 packed   :", round(rc[0], 3), "s")
rd = timed(lambda: method_d(b))
print("D two-level      :", round(rd[0], 3), "s")

# correctness: same starts everywhere; rows give same bucket partition
bn = np.asarray(b)
sa = np.asarray(ra[1][1])
for name, r in (("B", rb), ("C", rc), ("D", rd)):
    rows, starts = map(np.asarray, r[1])
    assert np.array_equal(starts, sa), name
    for l in range(0, L, 4):
        got = bn[l][rows[l]]
        assert np.all(np.diff(got) >= 0), name
        assert np.array_equal(np.sort(rows[l]), np.arange(N)), name
print("all correct")
