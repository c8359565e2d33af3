"""IVF clustered re-ranking: recall vs exact NN, probe semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.ivf import build_ivf, ivf_retrieve_topk
from crypto_rec_tpu.ops.oracle import exact_nearest, recall_at_k

RNG = np.random.default_rng(81)
KEY = jax.random.PRNGKey(33)


def _clustered(n, d, n_centers, spread=0.1):
    centers = RNG.normal(size=(n_centers, d)).astype(np.float32) * 4
    return (
        centers[RNG.integers(0, n_centers, size=n)]
        + spread * RNG.normal(size=(n, d)).astype(np.float32)
    ).astype(np.float32)


def test_ivf_full_probe_equals_exact():
    # probing every cluster = brute force
    x = jnp.asarray(_clustered(512, 16, n_centers=8))
    idx = build_ivf(KEY, x, n_clusters=8, metric="euclidean")
    vals, ids = ivf_retrieve_topk(idx, x, nprobe=8, top_k=5, q_block=64)
    _d, true_idx = exact_nearest(x, x, "euclidean", 5)
    assert float(recall_at_k(ids, true_idx)) > 0.999
    assert np.allclose(np.asarray(vals)[:, 0], 0.0, atol=1e-3)  # self at d=0


def test_ivf_partial_probe_recall():
    x = jnp.asarray(_clustered(4096, 24, n_centers=64))
    idx = build_ivf(KEY, x, n_clusters=64, metric="cosine", max_iterations=8)
    vals, ids = ivf_retrieve_topk(idx, x, nprobe=8, top_k=10, q_block=128)
    _d, true_idx = exact_nearest(x, x, "cosine", 10)
    r = float(recall_at_k(ids, true_idx))
    assert r > 0.95, r


def test_ivf_row_ids_valid_and_unique():
    x = jnp.asarray(RNG.normal(size=(300, 8)).astype(np.float32))
    idx = build_ivf(KEY, x, n_clusters=10, metric="euclidean")
    # every corpus row appears exactly once across blocks
    ids = np.asarray(idx.row_ids)
    real = ids[ids >= 0]
    assert sorted(real.tolist()) == list(range(300))
    _v, out = ivf_retrieve_topk(idx, x[:16], nprobe=3, top_k=4, q_block=16)
    out = np.asarray(out)
    for row in out:
        r = row[row >= 0]
        assert len(set(r.tolist())) == len(r)


def test_ivf_train_subsample():
    x = jnp.asarray(_clustered(1000, 12, n_centers=16))
    idx = build_ivf(KEY, x, n_clusters=16, metric="cosine", train_rows=256)
    assert idx.blocks.shape[0] == 16
    assert int(jnp.sum(idx.block_rows)) == 1000
