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

        # local scoring: nearest k rows of this corpus shard.  Pad slots
        # (rid < 0, bucket-partition fill rows) must never win a top-k slot.
        d = pairwise_distances(recv_q, corpus_blk, metric)     # [S*cap, n_loc]
        d = jnp.where(rid_blk[None, :] >= 0, d, jnp.inf)
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
        all_vals = all_vals[:q_loc].reshape(q_loc, S * k)
        all_gids = all_gids[:q_loc].reshape(q_loc, S * k)

        # Dedup across shards before the final top-k: under bucket-union
        # ownership a row lives on every shard that owns one of its L
        # buckets, so the same global id can come back from several shards
        # (with identical scores) and would otherwise burn top-k slots.
        order = jnp.argsort(all_gids, axis=1)
        g_sorted = jnp.take_along_axis(all_gids, order, axis=1)
        v_sorted = jnp.take_along_axis(all_vals, order, axis=1)
        dup = jnp.concatenate(
            [
                jnp.zeros((q_loc, 1), bool),
                (g_sorted[:, 1:] == g_sorted[:, :-1]) & (g_sorted[:, 1:] >= 0),
            ],
            axis=1,
        )
        v_sorted = jnp.where(dup, -jnp.inf, v_sorted)
        merged_vals, pos = jax.lax.top_k(v_sorted, k)
        merged_gids = jnp.take_along_axis(g_sorted, pos, axis=1)
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
    """Host-side bucket-ownership partition: owner_l(row) = bucket_ids[row, l]
    mod S, and shard s stores the DEDUPLICATED UNION over tables of the rows
    it owns.  Any row that collides with a query in ANY of the L tables is
    therefore resident on a shard that query visits (bucket_dest_mask), which
    is what gives the routed path the full L-table LSH recall — the
    distributed analog of the reference's per-table bucket fetch + std::set
    union (/root/reference/lib/lsh_cube.hpp:77-106).

    Returns (slot_rows [S*cap] int64 gather indices into the original corpus,
    row_ids [S*cap] int32 global ids with -1 marking pad slots, cap).  Pad
    slots repeat row 0 but carry row_id -1; route_queries_by_bucket masks
    them out of local top-k.  Expected replication factor is <= L (exactly
    the L-fold replication the packed-slab layout already pays on one chip).
    """
    import numpy as np

    b = np.asarray(bucket_ids)                       # [n, L]
    owners = b % n_shards                            # [n, L]
    members = [
        np.nonzero((owners == s).any(axis=1))[0] for s in range(n_shards)
    ]
    cap = max(1, max(len(m) for m in members))
    row_ids = -np.ones((n_shards, cap), np.int32)
    slot_rows = np.zeros((n_shards, cap), np.int64)
    for s, rows in enumerate(members):
        row_ids[s, : len(rows)] = rows
        slot_rows[s, : len(rows)] = rows
    return slot_rows.reshape(-1), row_ids.reshape(-1), cap


def bucket_dest_mask(q_buckets, n_shards: int) -> jax.Array:
    """[q, L] query bucket ids -> [q, S] bool destination mask: query q
    visits shard s iff s owns one of q's L buckets (mod-S ownership,
    matching partition_corpus_by_bucket)."""
    owners = q_buckets % n_shards                    # [q, L]
    shards = jnp.arange(n_shards, dtype=owners.dtype)
    return jnp.any(owners[:, :, None] == shards[None, None, :], axis=1)


def routing_overflow(dest_mask, n_shards: int, cap: int):
    """Capacity accounting for route_queries_by_bucket: per source shard and
    destination, requests beyond `cap` are dropped by _compact_slots.
    Returns (dropped_requests, total_requests)."""
    import numpy as np

    dm = np.asarray(dest_mask)
    q = dm.shape[0]
    q_loc = q // n_shards
    dropped = 0
    for src in range(n_shards):
        counts = dm[src * q_loc: (src + 1) * q_loc].sum(axis=0)
        dropped += int(np.maximum(counts - cap, 0).sum())
    return dropped, int(dm.sum())


def routed_retrieve_topk(
    mesh: Mesh,
    index,                  # LshIndex over `corpus` (models/lsh/index.py)
    queries: jax.Array,     # [q, d]
    corpus: jax.Array,      # [n, d] — the rows the index was built over
    top_k: int,
    cap: int = 0,
):
    """BASELINE.json's "all-to-all lookup exchange", end to end: the corpus
    is partitioned by LSH bucket ownership, each query travels (all_to_all)
    only to the <=L shards that own one of its buckets, is scored against
    the resident rows there, and the per-shard top-k merge travels back.

    -> (scores [q, top_k] descending nearest-first, global row ids [q, top_k]
        with -1 pads, stats dict with overflow/replication accounting).

    cap = per-(source, destination) query capacity; 0 => q // S (no overflow
    possible).  Smaller caps trade ICI bandwidth for dropped requests, which
    `stats` quantifies and the recall oracle measures.
    """
    import numpy as np

    from crypto_rec_tpu.models.lsh.index import query_hashes

    S = mesh.shape["mp"]
    q, d = queries.shape
    pad_q = (-q) % S
    queries_p = jnp.pad(queries, ((0, pad_q), (0, 0)))

    q_buckets, _ = query_hashes(index, queries)
    dest = bucket_dest_mask(q_buckets, S)
    dest = jnp.pad(dest, ((0, pad_q), (0, 0)))       # pad queries visit nobody

    slot_rows, row_ids, corpus_cap = partition_corpus_by_bucket(
        index.bucket_ids, S
    )
    part_corpus = corpus[slot_rows]                  # [S * corpus_cap, d]

    cap = cap or (q + pad_q) // S
    vals, gids = route_queries_by_bucket(
        mesh, queries_p, dest, part_corpus,
        jnp.asarray(row_ids), index.metric, top_k, cap,
    )
    dropped, total = routing_overflow(dest, S, cap)
    stats = {
        "n_shards": S,
        "cap": cap,
        "dropped_requests": dropped,
        "total_requests": total,
        "corpus_rows": int(corpus.shape[0]),
        "resident_rows_per_shard": int(corpus_cap),
        "replication_factor": round(
            S * corpus_cap / max(1, corpus.shape[0]), 3
        ),
        "mean_destinations_per_query": round(
            float(np.asarray(dest).sum() / max(1, q)), 3
        ),
    }
    return vals[:q], gids[:q], stats
