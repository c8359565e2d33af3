"""Index + user-matrix checkpointing.

The reference rebuilds all state every run (SURVEY.md §5: no checkpointing).
At 10^8..10^9-row scale (BASELINE.json configs 4-5) rebuilding the hash
tables per run is not acceptable, so the index (hash-family params + bucket
tables + CSR layout) and the user matrix round-trip through an npz archive.
Sharded arrays are gathered host-side on save and re-placed on load with the
caller's sharding; per-shard streaming saves are a later optimization.
"""

from __future__ import annotations

import json
import numpy as np

import jax.numpy as jnp

from crypto_rec_tpu.io.users import UserMatrix
from crypto_rec_tpu.models.lsh.hyperplane import CosineLsh
from crypto_rec_tpu.models.lsh.pstable import PStableLsh
from crypto_rec_tpu.models.lsh.index import LshIndex

_FORMAT_VERSION = 1


def save_index(path: str, index: LshIndex) -> None:
    meta = {
        "version": _FORMAT_VERSION,
        "metric": index.metric,
        "n_buckets": index.n_buckets,
        "n_rows": index.n_rows,
    }
    arrays = {
        "bucket_ids": np.asarray(index.bucket_ids),
        "sorted_rows": np.asarray(index.sorted_rows),
        "bucket_starts": np.asarray(index.bucket_starts),
    }
    fam = index.family
    if index.metric == "cosine":
        meta.update(k=fam.k, L=fam.L)
        arrays["proj"] = np.asarray(fam.proj)
    else:
        meta.update(k=fam.k, L=fam.L, w=fam.w)
        arrays["proj"] = np.asarray(fam.proj)
        arrays["offsets"] = np.asarray(fam.offsets)
        arrays["weights"] = np.asarray(fam.weights)
        arrays["detailed"] = np.asarray(index.detailed)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_index(path: str) -> LshIndex:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported index version {meta['version']}")
        if meta["metric"] == "cosine":
            fam = CosineLsh(proj=jnp.asarray(z["proj"]), k=meta["k"], L=meta["L"])
            detailed = None
        else:
            fam = PStableLsh(
                proj=jnp.asarray(z["proj"]),
                offsets=jnp.asarray(z["offsets"]),
                weights=jnp.asarray(z["weights"]),
                w=meta["w"], k=meta["k"], L=meta["L"],
            )
            detailed = jnp.asarray(z["detailed"])
        return LshIndex(
            metric=meta["metric"],
            n_buckets=meta["n_buckets"],
            n_rows=meta["n_rows"],
            family=fam,
            bucket_ids=jnp.asarray(z["bucket_ids"]),
            detailed=detailed,
            sorted_rows=jnp.asarray(z["sorted_rows"]),
            bucket_starts=jnp.asarray(z["bucket_starts"]),
        )


def save_user_matrix(path: str, um: UserMatrix) -> None:
    np.savez_compressed(
        path,
        ratings=um.ratings,
        known=um.known,
        mean=um.mean,
        ids=np.asarray(um.ids, dtype=object).astype(str),
    )


def load_user_matrix(path: str) -> UserMatrix:
    with np.load(path, allow_pickle=False) as z:
        return UserMatrix(
            ratings=z["ratings"],
            known=z["known"],
            mean=z["mean"],
            ids=[str(s) for s in z["ids"]],
        )


def index_nbytes(index: LshIndex) -> int:
    """Device-memory accounting for the index — the TPU analog of the
    reference's hand-rolled getSize() byte counters
    (/root/reference/lib/data_structures/cust_hashtable.hpp:128-138)."""
    total = 0
    for arr in (
        index.bucket_ids, index.sorted_rows, index.bucket_starts, index.detailed,
        index.packed, index.packed_rows, index.packed_sqnorm,
        index.packed_detailed, index.packed_scale,
    ):
        if arr is not None:
            total += arr.size * arr.dtype.itemsize
    fam = index.family
    total += fam.proj.size * fam.proj.dtype.itemsize
    if isinstance(fam, PStableLsh):
        total += fam.offsets.size * 4 + fam.weights.size * 4
    return int(total)
