"""Checkpoint round-trip tests: saved index answers queries identically."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.checkpoint import (
    save_index,
    load_index,
    save_user_matrix,
    load_user_matrix,
    index_nbytes,
)
from crypto_rec_tpu.io.users import UserMatrix
from crypto_rec_tpu.models.lsh.index import build_index, candidate_mask

RNG = np.random.default_rng(11)
KEY = jax.random.PRNGKey(5)


def test_index_roundtrip(tmp_path):
    x = jnp.asarray(RNG.normal(size=(50, 12)).astype(np.float32))
    for metric in ("cosine", "euclidean"):
        idx = build_index(KEY, x, metric, k=3, L=2, lsh_bucket_div=4, euclidean_h_w=2.0)
        p = str(tmp_path / f"{metric}.npz")
        save_index(p, idx)
        idx2 = load_index(p)
        q = jnp.asarray(RNG.normal(size=(7, 12)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(candidate_mask(idx, q)), np.asarray(candidate_mask(idx2, q))
        )
        assert index_nbytes(idx2) > 0


def test_user_matrix_roundtrip(tmp_path):
    um = UserMatrix(
        ratings=RNG.normal(size=(4, 3)).astype(np.float32),
        known=RNG.random((4, 3)) < 0.5,
        mean=RNG.normal(size=4).astype(np.float32),
        ids=["a", "b", "c", "d"],
    )
    p = str(tmp_path / "um.npz")
    save_user_matrix(p, um)
    um2 = load_user_matrix(p)
    np.testing.assert_array_equal(um.ratings, um2.ratings)
    np.testing.assert_array_equal(um.known, um2.known)
    assert um2.ids == um.ids
