"""All-to-all bucket routing: queries travel to the shards that own their
LSH buckets; scores travel back.

This is the "all-to-all lookup exchange" leg of BASELINE.json: instead of
every shard seeing every query (the all_gather merge in parallel/sharded.py,
fine when P*(c+2) is small), the corpus is partitioned by bucket ownership —
owner(row) = primary_bucket(row) mod S — and a query visits only the shards
that own one of its L buckets.  The exchange is two `jax.lax.all_to_all`s
(queries out, top-k results back) with a fixed per-destination capacity so
shapes stay static; overflow beyond the capacity is dropped and accounted
for by the recall oracle.

Pipeline per shard (shard_map over a 1-D "mp" mesh):
  1. compact local queries per destination into [S, cap] slot tables;
  2. all_to_all the [S, cap, d] query buffer (ICI);
  3. score received queries against the local corpus shard, local top-k;
  4. all_to_all the [S, cap, k] (score, global-row-id) results back;
  5. scatter results to the originating slots and merge the <=S partial
     top-k lists per query.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from crypto_rec_tpu.ops.distances import pairwise_distances


def _compact_slots(dest_mask: jax.Array, cap: int) -> Tuple[jax.Array, jax.Array]:
    """[q_loc, S] bool -> (slots [S, cap] local query ids, valid [S, cap]).

    Stable compaction by sort: for each destination, the ids of the queries
    that want it, front-packed, truncated to cap.
    """
    q_loc, S = dest_mask.shape
    ids = jnp.broadcast_to(jnp.arange(q_loc, dtype=jnp.int32)[:, None], (q_loc, S))
    # sort key: wanted queries first, preserving id order
    key = jnp.where(dest_mask, ids, q_loc)
    sorted_key = jnp.sort(key, axis=0).T           # [S, q_loc]
    if cap > q_loc:  # pad with the "empty" sentinel
        sorted_key = jnp.pad(
            sorted_key, ((0, 0), (0, cap - q_loc)), constant_values=q_loc
        )
    slots = sorted_key[:, :cap]
    valid = slots < q_loc
    return jnp.where(valid, slots, 0), valid


@functools.partial(
    jax.jit, static_argnames=("mesh", "metric", "k", "cap")
)
def route_queries_by_bucket(
    mesh: Mesh,
    queries: jax.Array,     # [q, d] sharded over "mp"
    dest_mask: jax.Array,   # [q, S] bool: query q must visit shard s
    corpus: jax.Array,      # [n, d] bucket-partitioned, sharded over "mp"
    row_ids: jax.Array,     # [n] int32 global row ids, sharded over "mp"
    metric: str,
    k: int,
    cap: int,
) -> Tuple[jax.Array, jax.Array]:
    """-> (neg_dist_topk [q, k] descending, global_row_ids [q, k], -1 pad).

    Scores are negated distances so "descending" means nearest-first.
    """
    S = mesh.shape["mp"]

    def body(q_blk, dmask, corpus_blk, rid_blk):
        q_loc = q_blk.shape[0]
        slots, valid = _compact_slots(dmask, cap)              # [S, cap]
        send_q = q_blk[slots] * valid[:, :, None]              # [S, cap, d]

        recv_q = jax.lax.all_to_all(send_q, "mp", 0, 0, tiled=False)
        recv_valid = jax.lax.all_to_all(valid, "mp", 0, 0, tiled=False)
        recv_q = recv_q.reshape(S * cap, -1)

        # local scoring: nearest k rows of this corpus shard
        d = pairwise_distances(recv_q, corpus_blk, metric)     # [S*cap, n_loc]
        neg_vals, idx = jax.lax.top_k(-d, k)                   # descending
        gids = rid_blk[idx]                                    # [S*cap, k]
        neg_vals = jnp.where(
            recv_valid.reshape(-1)[:, None], neg_vals, -jnp.inf
        )
        gids = jnp.where(recv_valid.reshape(-1)[:, None], gids, -1)

        back_vals = jax.lax.all_to_all(
            neg_vals.reshape(S, cap, k), "mp", 0, 0, tiled=False
        )                                                      # [S, cap, k]
        back_gids = jax.lax.all_to_all(
            gids.reshape(S, cap, k), "mp", 0, 0, tiled=False
        )

        # scatter back: query slots[s, c] owns back_*[s, c, :].  Invalid
        # capacity slots write into a dump row (q_loc) so they can never
        # clobber a real query's results.
        all_vals = jnp.full((q_loc + 1, S, k), -jnp.inf, jnp.float32)
        all_gids = jnp.full((q_loc + 1, S, k), -1, jnp.int32)
        s_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, cap))
        flat_slots = jnp.where(valid, slots, q_loc).reshape(-1)
        flat_s = s_idx.reshape(-1)
        all_vals = all_vals.at[flat_slots, flat_s].set(back_vals.reshape(-1, k))
        all_gids = all_gids.at[flat_slots, flat_s].set(back_gids.reshape(-1, k))
        all_vals = all_vals[:q_loc]
        all_gids = all_gids[:q_loc]

        merged_vals, pos = jax.lax.top_k(all_vals.reshape(q_loc, S * k), k)
        merged_gids = jnp.take_along_axis(all_gids.reshape(q_loc, S * k), pos, axis=1)
        merged_gids = jnp.where(merged_vals > -jnp.inf, merged_gids, -1)
        return merged_vals, merged_gids

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("mp", None), P("mp", None), P("mp", None), P("mp")),
        out_specs=(P("mp", None), P("mp", None)),
        check_vma=False,
    )(queries, dest_mask, corpus, row_ids)


def partition_corpus_by_bucket(bucket_ids, n_shards: int):
    """Host-side helper: owner shard per row = primary bucket mod S; returns
    (perm, shard_sizes, padded_row_ids) — rows reordered so each shard's
    slice is contiguous and equally padded (pad rows repeat row 0 with
    row_id -1 so they never win a top-k slot).
    """
    import numpy as np

    b0 = np.asarray(bucket_ids)[:, 0]
    owner = b0 % n_shards
    perm = np.argsort(owner, kind="stable")
    sizes = np.bincount(owner, minlength=n_shards)
    cap = int(sizes.max())
    row_ids = -np.ones((n_shards, cap), np.int32)
    slot_rows = np.zeros((n_shards, cap), np.int64)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    for s in range(n_shards):
        rows = perm[offs[s]: offs[s + 1]]
        row_ids[s, : len(rows)] = rows
        slot_rows[s, : len(rows)] = rows
    return slot_rows.reshape(-1), row_ids.reshape(-1), cap
