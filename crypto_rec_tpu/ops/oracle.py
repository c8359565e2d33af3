"""Brute-force exact nearest-neighbor oracle + recall.

The reference ships exhaustive-search oracles that `main` never calls
(min_vector_euclidean_dist / min_vector_cosine_dist,
/root/reference/lib/utils.hpp:107-140).  Here they are first-class: the
batched exact-NN sweep is the ground truth for every recall@k measurement
(BASELINE.json north star: recall@10 >= 0.95 vs exact NN).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from crypto_rec_tpu.ops.distances import pairwise_distances


@functools.partial(jax.jit, static_argnames=("metric", "k", "block_rows"))
def exact_nearest(
    queries: jax.Array,
    index: jax.Array,
    metric: str,
    k: int,
    block_rows: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN: [q, d] vs [n, d] -> (dists [q, k], idx [q, k]) ascending.

    Streams query blocks so the [q, n] distance matrix never materializes.
    """
    q = queries.shape[0]
    pad = (-q) % block_rows
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, block_rows, queries.shape[1])

    def one_block(blk):
        d = pairwise_distances(blk, index, metric)
        negd, idx = jax.lax.top_k(-d, k)
        return -negd, idx

    dists, idx = jax.lax.map(one_block, blocks)
    return (
        dists.reshape(-1, k)[:q],
        idx.reshape(-1, k)[:q],
    )


def recall_at_k(retrieved_idx: jax.Array, true_idx: jax.Array) -> jax.Array:
    """Mean fraction of true_idx [q, k] found in retrieved_idx [q, m].

    Negative entries in retrieved_idx are padding and never match.
    """
    matches = retrieved_idx[:, None, :] == true_idx[:, :, None]
    hit = jnp.any(matches & (retrieved_idx[:, None, :] >= 0), axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
