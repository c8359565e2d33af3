"""Clustering tests: init distributions, Lloyd argmin, updates, silhouette,
range assignment, full k-means driver (monotone inertia, convergence)."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.cluster.init import random_init, kmeans_pp_init
from crypto_rec_tpu.models.cluster.assign import (
    lloyd_assign,
    lloyd_for_remaining,
    range_assign,
    index_range_assign,
)
from crypto_rec_tpu.models.cluster.update import kmeans_update, pam_update
from crypto_rec_tpu.models.cluster.silhouette import silhouette
from crypto_rec_tpu.models.cluster.kmeans import kmeans

RNG = np.random.default_rng(2)
KEY = jax.random.PRNGKey(42)


def _blobs(n_per=50, k=4, d=8, spread=0.15):
    centers = RNG.normal(size=(k, d)).astype(np.float32) * 4
    pts = np.concatenate(
        [c + spread * RNG.normal(size=(n_per, d)).astype(np.float32) for c in centers]
    )
    labels = np.repeat(np.arange(k), n_per)
    return pts.astype(np.float32), labels, centers


def test_random_init_distinct():
    idx = np.asarray(random_init(KEY, 100, 10))
    assert len(set(idx.tolist())) == 10


def test_kmeans_pp_prefers_spread():
    x, _, _ = _blobs()
    idx = np.asarray(kmeans_pp_init(KEY, jnp.asarray(x), 4, "euclidean"))
    assert len(set(idx.tolist())) == 4
    # the 4 chosen seeds should land in 4 different blobs w.h.p.
    blob_of = idx // 50
    assert len(set(blob_of.tolist())) >= 3


def test_lloyd_assign_matches_numpy():
    x, _, centers = _blobs()
    labels, dists = lloyd_assign(jnp.asarray(x), jnp.asarray(centers), "euclidean")
    want = np.argmin(
        np.linalg.norm(x[:, None] - centers[None], axis=-1), axis=1
    )
    np.testing.assert_array_equal(np.asarray(labels), want)
    np.testing.assert_allclose(
        np.asarray(dists),
        np.linalg.norm(x - centers[want], axis=1),
        atol=1e-4,
    )


def test_lloyd_for_remaining_only_touches_unassigned():
    x, _, centers = _blobs(n_per=10)
    labels = jnp.asarray(np.full(40, -1, np.int32)).at[:20].set(0)
    dists = jnp.zeros(40)
    new_labels, _ = lloyd_for_remaining(
        jnp.asarray(x), jnp.asarray(centers), labels, dists, "euclidean"
    )
    assert np.all(np.asarray(new_labels[:20]) == 0)
    assert np.all(np.asarray(new_labels[20:]) >= 0)


def test_kmeans_update_means_and_stop():
    x = jnp.asarray(RNG.normal(size=(30, 4)).astype(np.float32))
    labels = jnp.asarray((np.arange(30) % 3).astype(np.int32))
    old = jnp.zeros((3, 4), jnp.float32)
    new_c, cont = kmeans_update(x, labels, old, 3, "euclidean", 0.05)
    want = np.stack([np.asarray(x)[np.arange(30) % 3 == c].mean(0) for c in range(3)])
    np.testing.assert_allclose(np.asarray(new_c), want, atol=1e-5)
    assert bool(cont)
    # converged case: old == means -> stop, centers unchanged
    same_c, cont2 = kmeans_update(x, labels, jnp.asarray(want), 3, "euclidean", 0.05)
    assert not bool(cont2)
    np.testing.assert_allclose(np.asarray(same_c), want, atol=1e-6)


def test_kmeans_update_empty_cluster_keeps_old():
    x = jnp.ones((4, 2), jnp.float32)
    labels = jnp.zeros((4,), jnp.int32)  # cluster 1 empty
    old = jnp.asarray([[0.0, 0.0], [5.0, 5.0]])
    new_c, _ = kmeans_update(x, labels, old, 2, "euclidean", 0.01)
    np.testing.assert_allclose(np.asarray(new_c[1]), [5.0, 5.0])


def test_pam_update_finds_medoid():
    x, labels, _ = _blobs(n_per=20, k=2)
    lab = jnp.asarray(labels.astype(np.int32))
    med0 = jnp.asarray([0, 20], jnp.int32)
    med, swapped = pam_update(jnp.asarray(x), lab, med0, 2, "euclidean")
    med = np.asarray(med)
    # brute-force medoid per cluster
    for c in range(2):
        members = np.where(labels == c)[0]
        d = np.linalg.norm(x[members][:, None] - x[members][None], axis=-1)
        want = members[np.argmin(d.sum(1))]
        assert med[c] == want


def test_silhouette_well_separated_near_one():
    x, labels, centers = _blobs(n_per=30, k=3, spread=0.05)
    sil = np.asarray(
        silhouette(
            jnp.asarray(x),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(centers),
            3,
            "euclidean",
        )
    )
    assert sil.shape == (4,)
    assert np.all(sil > 0.9)


def test_silhouette_matches_bruteforce():
    x = RNG.normal(size=(40, 5)).astype(np.float32)
    labels = (np.arange(40) % 3).astype(np.int32)
    centers = np.stack([x[labels == c].mean(0) for c in range(3)])
    got = np.asarray(
        silhouette(jnp.asarray(x), jnp.asarray(labels), jnp.asarray(centers), 3, "euclidean")
    )
    # brute force
    d = np.linalg.norm(x[:, None] - x[None], axis=-1)
    dcc = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    np.fill_diagonal(dcc, np.inf)
    nearest = np.argmin(dcc, axis=1)
    s = np.zeros(40)
    for i in range(40):
        mine = labels == labels[i]
        a = d[i, mine].sum() / max(mine.sum() - 1, 1)
        nb = labels == nearest[labels[i]]
        b = d[i, nb].mean()
        s[i] = (b - a) / max(a, b)
    for c in range(3):
        np.testing.assert_allclose(got[c], s[labels == c].mean(), atol=1e-4)
    np.testing.assert_allclose(got[3], s.mean(), atol=1e-4)


def test_range_assign_covers_candidates():
    x, labels, centers = _blobs(n_per=25, k=3)
    full_mask = jnp.ones((3, 75), bool)
    got_labels, got_dists = range_assign(
        jnp.asarray(x), jnp.asarray(centers), full_mask, "euclidean"
    )
    want, _ = lloyd_assign(jnp.asarray(x), jnp.asarray(centers), "euclidean")
    # with full candidate sets, ball-growing converges to nearest-centroid
    np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(want))


def test_index_range_assign_no_unassigned():
    x, _, centers = _blobs(n_per=25, k=3)
    # candidates only for a few points; lloyd mops up the rest
    mask = jnp.zeros((3, 75), bool).at[:, :10].set(True)
    labels, dists = index_range_assign(
        jnp.asarray(x), jnp.asarray(centers), mask, "euclidean"
    )
    assert np.all(np.asarray(labels) >= 0)


def test_kmeans_full_driver_recovers_blobs():
    x, true_labels, _ = _blobs(n_per=40, k=4, spread=0.05)
    res = kmeans(KEY, jnp.asarray(x), 4, "euclidean", max_iterations=20, min_dist=0.001)
    labels = np.asarray(res.labels)
    # each true blob maps to one predicted cluster
    for c in range(4):
        blob = labels[true_labels == c]
        assert len(set(blob.tolist())) == 1
    assert int(res.iterations) <= 20
