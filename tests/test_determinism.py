"""Determinism tests — the jit-level analog of race detection (SURVEY.md §5).

The reference is irreproducible by construction (srand(time(0)) per call,
lsh_cube.hpp:49-51, crypto_rec.hpp:350,410).  Here every run is a pure
function of its PRNG key: identical keys must give bit-identical results,
including across the multi-device code paths (collectives must not
introduce scheduling-dependent reductions).
"""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.cluster.kmeans import kmeans
from crypto_rec_tpu.models.lsh.index import build_index, candidate_ids
from crypto_rec_tpu.models.rec.engine import RatingSet, recommend
from crypto_rec_tpu.models.rec.validate import ten_fold_mae
from crypto_rec_tpu.parallel.mesh import make_mesh
from crypto_rec_tpu.parallel.sharded import shard_rating_set, sharded_recommend

RNG = np.random.default_rng(51)
KEY = jax.random.PRNGKey(77)


def _ratings(n, c, seed=1):
    rng = np.random.default_rng(seed)
    known = rng.random((n, c)) < 0.6
    known[:, 0] = True
    raw = np.abs(rng.normal(size=(n, c))).astype(np.float32) * known
    mean = (raw * known).sum(1) / known.sum(1)
    return RatingSet(
        jnp.asarray(np.where(known, raw, mean[:, None]).astype(np.float32)),
        jnp.asarray(known),
        jnp.asarray(mean.astype(np.float32)),
    )


def test_kmeans_bitwise_deterministic():
    x = jnp.asarray(RNG.normal(size=(200, 16)).astype(np.float32))
    a = kmeans(KEY, x, 8, "euclidean", max_iterations=10)
    b = kmeans(KEY, x, 8, "euclidean", max_iterations=10)
    assert np.array_equal(np.asarray(a.centroids), np.asarray(b.centroids))
    assert np.array_equal(np.asarray(a.labels), np.asarray(b.labels))


def test_index_and_query_deterministic():
    x = jnp.asarray(RNG.normal(size=(128, 10)).astype(np.float32))
    ids1 = candidate_ids(build_index(KEY, x, "euclidean", 3, 4, 8, 2.0), x, budget=64)
    ids2 = candidate_ids(build_index(KEY, x, "euclidean", 3, 4, 8, 2.0), x, budget=64)
    assert np.array_equal(np.asarray(ids1), np.asarray(ids2))


def test_cv_mae_deterministic():
    users = _ratings(60, 8)
    m1 = ten_fold_mae(KEY, users, "cosine", 4, 4, 4, 0.5, 5)
    m2 = ten_fold_mae(KEY, users, "cosine", 4, 4, 4, 0.5, 5)
    assert m1 == m2


def test_sharded_recommend_deterministic():
    mesh = make_mesh((2, 4))
    q = _ratings(16, 8, seed=2)
    nb = shard_rating_set(mesh, _ratings(32, 8, seed=3), "mp")
    mask = jnp.asarray(RNG.random((16, 32)) < 0.5)
    r1 = sharded_recommend(mesh, q, nb, mask, top_p=4, top_n=2)
    r2 = sharded_recommend(mesh, q, nb, mask, top_p=4, top_n=2)
    assert np.array_equal(np.asarray(r1.predicted), np.asarray(r2.predicted))
    assert np.array_equal(np.asarray(r1.top_n), np.asarray(r2.top_n))
