"""Unit tests for distance / top-k / oracle / hamming kernels vs numpy."""

import numpy as np
import jax.numpy as jnp

from crypto_rec_tpu.ops.distances import (
    cosine_similarity_matrix,
    cosine_distance_matrix,
    euclidean_distance_matrix,
    blocked_pairwise_distances,
)
from crypto_rec_tpu.ops.topk import masked_topk_desc, topn_indices
from crypto_rec_tpu.ops.oracle import exact_nearest, recall_at_k
from crypto_rec_tpu.ops.hamming import hamming_probe_order

RNG = np.random.default_rng(0)


def _np_cos(a, b):
    num = a @ b.T
    den = np.linalg.norm(a, axis=1)[:, None] * np.linalg.norm(b, axis=1)[None]
    return num / den


def test_cosine_similarity_vs_numpy():
    a = RNG.normal(size=(7, 13)).astype(np.float32)
    b = RNG.normal(size=(11, 13)).astype(np.float32)
    got = np.asarray(cosine_similarity_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_cos(a, b), atol=1e-5)


def test_euclidean_vs_numpy():
    a = RNG.normal(size=(5, 9)).astype(np.float32)
    b = RNG.normal(size=(6, 9)).astype(np.float32)
    got = np.asarray(euclidean_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.norm(a[:, None] - b[None], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blocked_matches_unblocked():
    a = RNG.normal(size=(130, 8)).astype(np.float32)
    b = RNG.normal(size=(17, 8)).astype(np.float32)
    full = np.asarray(cosine_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    blocked = np.asarray(
        blocked_pairwise_distances(jnp.asarray(a), jnp.asarray(b), "cosine", block_rows=32)
    )
    np.testing.assert_allclose(blocked, full, atol=1e-5)


def test_masked_topk():
    vals = jnp.asarray([[0.9, 0.1, 0.5, 0.7]])
    mask = jnp.asarray([[True, True, False, True]])
    v, i, valid = masked_topk_desc(vals, mask, 3)
    assert i[0].tolist() == [0, 3, 1]
    assert valid[0].tolist() == [True, True, True]
    v, i, valid = masked_topk_desc(vals, jnp.asarray([[True, False, False, False]]), 3)
    assert valid[0].tolist() == [True, False, False]


def test_topn_indices_sentinel():
    scores = jnp.asarray([[0.3, 0.9, 0.1]])
    mask = jnp.asarray([[True, False, False]])  # only one unknown coin
    top = topn_indices(scores, mask, 2)
    assert top[0].tolist() == [0, -1]


def test_exact_nearest_and_recall():
    index = RNG.normal(size=(200, 16)).astype(np.float32)
    queries = index[:10] + 0.001 * RNG.normal(size=(10, 16)).astype(np.float32)
    d, idx = exact_nearest(jnp.asarray(queries), jnp.asarray(index), "euclidean", 3)
    assert idx.shape == (10, 3)
    # each query's nearest neighbor is its own source row
    assert np.array_equal(np.asarray(idx[:, 0]), np.arange(10))
    assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-6)
    r = recall_at_k(idx, idx[:, :1])
    assert float(r) == 1.0
    r0 = recall_at_k(jnp.full((10, 3), -1), idx[:, :1])
    assert float(r0) == 0.0


def test_hamming_probe_order():
    masks = hamming_probe_order(3, 8).tolist()
    assert masks == [0, 1, 2, 4, 3, 5, 6, 7]
    assert hamming_probe_order(3, 100).tolist() == [0, 1, 2, 4, 3, 5, 6, 7]
    assert hamming_probe_order(4, 3).tolist() == [0, 1, 2]


def test_exact_nearest_streamed_matches_resident():
    """exact_nearest_streamed (host-corpus oracle, round 4) must agree
    with the device-resident oracle across block boundaries."""
    from crypto_rec_tpu.ops.oracle import exact_nearest, exact_nearest_streamed

    rng = np.random.default_rng(17)
    x = rng.normal(size=(1000, 24)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(33, 24)).astype(np.float32))
    for metric in ("cosine", "euclidean"):
        d1, i1 = exact_nearest(q, jnp.asarray(x), metric, 7, block_rows=16)
        d2, i2 = exact_nearest_streamed(q, x, metric, 7, corpus_block=256)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
