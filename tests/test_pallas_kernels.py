"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.lsh.hyperplane import CosineLsh
from crypto_rec_tpu.ops.pallas.signproj import signproj_bucket_ids
from crypto_rec_tpu.ops.pallas.gather import gather_bucket_windows

RNG = np.random.default_rng(23)
KEY = jax.random.PRNGKey(3)


def test_signproj_matches_xla():
    k, L, d, n = 5, 3, 32, 300
    fam = CosineLsh.create(KEY, d, k, L)
    x = jnp.asarray(RNG.normal(size=(n, d)).astype(np.float32))
    want = np.asarray(fam.bucket_ids(x))
    got = np.asarray(
        signproj_bucket_ids(x, fam.proj, k, L, block_rows=128, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_signproj_ragged_rows():
    k, L, d = 4, 2, 16
    fam = CosineLsh.create(KEY, d, k, L)
    x = jnp.asarray(RNG.normal(size=(77, d)).astype(np.float32))  # not a block multiple
    want = np.asarray(fam.bucket_ids(x))
    got = np.asarray(
        signproj_bucket_ids(x, fam.proj, k, L, block_rows=64, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_gather_bucket_windows():
    L, n, W, q = 3, 64, 8, 10
    sorted_rows = jnp.asarray(
        np.stack([RNG.permutation(n) for _ in range(L)]).astype(np.int32)
    )
    starts = jnp.asarray(RNG.integers(0, n, size=(q, L)).astype(np.int32))
    sizes = jnp.asarray(RNG.integers(0, W + 1, size=(q, L)).astype(np.int32))
    sizes = jnp.minimum(sizes, n - starts)  # CSR invariant
    got = np.asarray(
        gather_bucket_windows(sorted_rows, starts, sizes, window=W, interpret=True)
    )
    rows = np.asarray(sorted_rows)
    for i in range(q):
        for l in range(L):
            s, size = int(starts[i, l]), int(sizes[i, l])
            for w in range(W):
                if w < size and s + w < n:  # CSR invariant: start+size<=n in real use
                    assert got[i, l, w] == rows[l, s + w]
                else:
                    assert got[i, l, w] == n, (i, l, w, got[i, l, w])
