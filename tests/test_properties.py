"""Property tests (SURVEY.md §4): statistical invariants of the algorithms,
beyond pointwise unit checks."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.cluster.assign import lloyd_assign
from crypto_rec_tpu.models.cluster.init import kmeans_pp_init
from crypto_rec_tpu.models.cluster.update import kmeans_update
from crypto_rec_tpu.models.lsh.pstable import PStableLsh

RNG = np.random.default_rng(61)
KEY = jax.random.PRNGKey(13)


def test_kmeans_inertia_monotone_decreasing():
    """Lloyd + mean update can never increase within-cluster squared error."""
    x = jnp.asarray(RNG.normal(size=(300, 8)).astype(np.float32))
    idx = kmeans_pp_init(KEY, x, 6, "euclidean")
    c = x[idx]
    inertias = []
    for _ in range(8):
        labels, dists = lloyd_assign(x, c, "euclidean")
        inertias.append(float(jnp.sum(dists**2)))
        c, cont = kmeans_update(x, labels, c, 6, "euclidean", min_dist=0.0)
        if not bool(cont):
            break
    assert all(
        b <= a + 1e-3 for a, b in zip(inertias, inertias[1:])
    ), inertias


def test_pstable_collision_decreases_with_distance():
    """E2LSH property: closer pairs collide in more h-functions.

    h(x) = floor((v.x + t) / w); for ||a-b|| << w the collision probability
    approaches 1, for ||a-b|| >> w it approaches 0, monotone in between.
    """
    d, n_h = 16, 512
    fam = PStableLsh.create(KEY, d, k=n_h, L=1, w=4.0)
    base = jnp.asarray(RNG.normal(size=(1, d)).astype(np.float32))
    rates = []
    for dist in (0.1, 1.0, 4.0, 16.0):
        offset = RNG.normal(size=(1, d)).astype(np.float32)
        offset = offset / np.linalg.norm(offset) * dist
        other = base + jnp.asarray(offset)
        ha = np.asarray(fam.hash_values(base))[0, 0]
        hb = np.asarray(fam.hash_values(other))[0, 0]
        rates.append((ha == hb).mean())
    assert rates[0] > 0.9, rates
    assert all(a >= b - 0.05 for a, b in zip(rates, rates[1:])), rates
    assert rates[-1] < 0.4, rates


def test_cosine_mean_centered_prediction_shift_invariance():
    """Adding a constant to every neighbor's ratings AND mean leaves the
    mean-centered prediction unchanged (the math the reference relies on,
    crypto_rec.hpp:280-306)."""
    from crypto_rec_tpu.models.rec.engine import RatingSet, predict_scores

    q = RatingSet(
        ratings=jnp.asarray(RNG.random((3, 5)).astype(np.float32)),
        known=jnp.asarray(RNG.random((3, 5)) < 0.5),
        mean=jnp.asarray(RNG.random(3).astype(np.float32)),
    )
    n_r = jnp.asarray(RNG.random((6, 5)).astype(np.float32))
    n_mu = jnp.mean(n_r, axis=1)
    sims = jnp.asarray(RNG.random((3, 4)).astype(np.float32))
    idx = jnp.asarray(RNG.integers(0, 6, (3, 4)).astype(np.int32))
    valid = jnp.ones((3, 4), bool)

    p1 = predict_scores(q, RatingSet(n_r, n_r > 0, n_mu), sims, idx, valid)
    shifted = RatingSet(n_r + 7.0, n_r > 0, n_mu + 7.0)
    p2 = predict_scores(q, shifted, sims, idx, valid)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
