"""Row-sharded LSH index: per-shard CSR build + sharded retrieval.

The scale architecture for BASELINE.json configs 4-5 (v5e-8 sharded index,
1B rows over N>=2 hosts):

* the corpus is row-sharded over "mp"; every shard hashes ITS rows with the
  (replicated) hash family and builds a shard-local CSR bucket table — the
  build is embarrassingly parallel (one matmul + one sort per shard, no
  collectives);
* a query is hashed once (replicated — the family params are tiny), each
  shard gathers candidates from its local buckets, scores them against its
  local rows, and reduces to a local top-k;
* local top-ks (values + global row ids + optionally the rating rows) merge
  over an "mp" all_gather — the collective moves O(k) floats per query per
  shard, never corpus rows.

A CPU-mesh test asserts the sharded result equals the single-device
candidate_ids + scoring path row-for-row.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crypto_rec_tpu.models.lsh.hyperplane import CosineLsh
from crypto_rec_tpu.models.lsh.pstable import PStableLsh
from crypto_rec_tpu.models.lsh.index import (
    _csr_from_buckets,
    gather_candidate_ids,
)
from crypto_rec_tpu.ops.distances import pairwise_distances


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("family", "sorted_rows", "bucket_starts", "detailed"),
    meta_fields=("metric", "n_buckets", "n_local", "n_shards"),
)
@dataclasses.dataclass
class ShardedLshIndex:
    """Per-shard CSR tables.  sorted_rows/bucket_starts lead with the shard
    axis and are placed with P("mp", ...); row ids inside are shard-LOCAL."""

    metric: str
    n_buckets: int
    n_local: int
    n_shards: int
    family: object
    sorted_rows: jax.Array     # [S, L, n_local]
    bucket_starts: jax.Array   # [S, L, n_buckets + 1]
    detailed: Optional[jax.Array]  # [S, n_local, L, k] or None


def build_sharded_index(
    mesh: Mesh,
    key: jax.Array,
    corpus: jax.Array,   # [n, d], row-sharded over "mp" (or shardable)
    metric: str,
    k: int,
    L: int,
    lsh_bucket_div: int = 4,
    euclidean_h_w: float = 1.0,
) -> ShardedLshIndex:
    n, d = corpus.shape
    S = mesh.shape["mp"]
    if n % S:
        raise ValueError(f"corpus rows {n} must divide the mp axis {S}")
    n_local = n // S
    if metric == "cosine":
        fam = CosineLsh.create(key, d, k, L)
        n_buckets = fam.n_buckets
    elif metric == "euclidean":
        fam = PStableLsh.create(key, d, k, L, euclidean_h_w)
        n_buckets = max(1, n_local // max(1, lsh_bucket_div))
    else:
        raise ValueError(f"unknown metric {metric!r}")

    def body(x_blk):
        if metric == "cosine":
            b = fam.bucket_ids(x_blk)
            det = None
        else:
            det = fam.hash_values(x_blk)
            b = fam.bucket_ids_from_hashes(det, n_buckets)
        rows, starts = _csr_from_buckets(b, n_buckets)
        out = (rows[None], starts[None])
        if det is not None:
            out += (det[None],)
        return out

    out_specs = (P("mp", None, None), P("mp", None, None))
    if metric == "euclidean":
        out_specs += (P("mp", None, None, None),)
    outs = jax.shard_map(
        body, mesh=mesh, in_specs=(P("mp", None),), out_specs=out_specs,
        check_vma=False,
    )(corpus)
    rows, starts = outs[0], outs[1]
    det = outs[2] if metric == "euclidean" else None
    return ShardedLshIndex(
        metric=metric,
        n_buckets=n_buckets,
        n_local=n_local,
        n_shards=S,
        family=fam,
        sorted_rows=rows,
        bucket_starts=starts,
        detailed=det,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "budget", "per_table", "top_k", "filtered")
)
def sharded_retrieve_topk(
    mesh: Mesh,
    index: ShardedLshIndex,
    queries: jax.Array,   # [q, d] (replicated across mp)
    corpus: jax.Array,    # [n, d] row-sharded over "mp"
    budget: int,
    top_k: int,
    per_table: int = 0,
    filtered: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """-> (scores [q, top_k] descending, global row ids [q, top_k], -1 pad).

    Scores are cosine similarity (metric="cosine") or negated distance
    (metric="euclidean") so descending always means nearest-first.
    """
    metric = index.metric
    fam = index.family
    n_local = index.n_local

    def body(rows, starts, det, corpus_blk):
        # hash queries (replicated tiny compute)
        if metric == "cosine":
            qb = fam.bucket_ids(queries)
            qd = None
        else:
            qd = fam.hash_values(queries)
            qb = fam.bucket_ids_from_hashes(qd, index.n_buckets)
        det_l = det[0] if (filtered and det is not None) else None
        local_ids = gather_candidate_ids(
            rows[0], starts[0], det_l, n_local, qb, qd, budget, per_table
        )                                             # [q, budget] local, -1 pad
        valid = local_ids >= 0
        safe = jnp.maximum(local_ids, 0)
        cand = corpus_blk[safe]                       # [q, budget, d]
        if metric == "cosine":
            dots = jnp.einsum(
                "qd,qbd->qb", queries, cand, preferred_element_type=jnp.float32
            )
            qn = jnp.linalg.norm(queries, axis=1, keepdims=True)
            cn = jnp.linalg.norm(cand, axis=2)
            score = dots / jnp.maximum(qn * cn, 1e-30)
        else:
            diff = cand - queries[:, None, :]
            score = -jnp.sqrt(
                jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
            )
        score = jnp.where(valid, score, -jnp.inf)
        loc_vals, slot = jax.lax.top_k(score, top_k)  # [q, top_k]
        loc_ids = jnp.take_along_axis(safe, slot, axis=1)
        shard = jax.lax.axis_index("mp")
        gids = jnp.where(loc_vals > -jnp.inf, loc_ids + shard * n_local, -1)

        g_vals = jax.lax.all_gather(loc_vals, "mp", axis=1).reshape(
            queries.shape[0], -1
        )
        g_ids = jax.lax.all_gather(gids, "mp", axis=1).reshape(
            queries.shape[0], -1
        )
        vals, pos = jax.lax.top_k(g_vals, top_k)
        ids = jnp.take_along_axis(g_ids, pos, axis=1)
        return vals, jnp.where(vals > -jnp.inf, ids, -1)

    det_spec = P("mp", None, None, None) if index.detailed is not None else None
    in_specs = [P("mp", None, None), P("mp", None, None)]
    args = [index.sorted_rows, index.bucket_starts]
    if index.detailed is not None:
        in_specs.append(det_spec)
        args.append(index.detailed)
    else:
        def body_nodet(rows, starts, corpus_blk):
            return body(rows, starts, None, corpus_blk)
    in_specs.append(P("mp", None))
    args.append(corpus)

    if index.detailed is not None:
        fn = body
    else:
        fn = body_nodet
    return jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(*args)


def shard_corpus(mesh: Mesh, corpus: jax.Array) -> jax.Array:
    return jax.device_put(corpus, NamedSharding(mesh, P("mp", None)))
