"""Pod-scale CF over the sharded CSR index vs the single-device engine."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.lsh.index import build_index, candidate_mask
from crypto_rec_tpu.models.rec.engine import RatingSet, recommend
from crypto_rec_tpu.parallel.mesh import make_mesh
from crypto_rec_tpu.parallel.sharded_index import (
    build_sharded_index,
    sharded_recommend_csr,
    shard_corpus,
)

RNG = np.random.default_rng(71)
KEY = jax.random.PRNGKey(21)


def _ratings(n, c, seed):
    rng = np.random.default_rng(seed)
    known = rng.random((n, c)) < 0.6
    known[np.arange(n), rng.integers(0, c, n)] = True
    raw = np.abs(rng.normal(size=(n, c))).astype(np.float32) * known
    mean = (raw * known).sum(1) / known.sum(1)
    ratings = np.where(known, raw, mean[:, None]).astype(np.float32)
    return ratings, known, mean.astype(np.float32)


def test_sharded_csr_recommend_matches_dense_engine():
    mesh = make_mesh((1, 8))
    n, c, q = 8 * 16, 12, 24
    nr, nk, nm = _ratings(n, c, seed=1)
    qr, qk, qm = _ratings(q, c, seed=2)
    queries = RatingSet(jnp.asarray(qr), jnp.asarray(qk), jnp.asarray(qm))
    neighbors = RatingSet(jnp.asarray(nr), jnp.asarray(nk), jnp.asarray(nm))

    # single-device reference: dense mask from an equivalently-built index
    # (same key => same hyperplanes => same buckets)
    local = build_index(KEY, neighbors.ratings, "cosine", 4, 4, 4, 1.0)
    mask = candidate_mask(local, queries.ratings)
    want = recommend(queries, neighbors, mask, top_p=6, top_n=3)

    sharded = build_sharded_index(
        mesh, KEY, shard_corpus(mesh, neighbors.ratings), "cosine", 4, 4
    )
    # generous budget/window: every bucket fully covered -> identical
    # candidate sets -> identical predictions
    pred, top, has, sims, gids, stats = sharded_recommend_csr(
        mesh, sharded,
        queries.ratings, queries.known, queries.mean,
        shard_corpus(mesh, neighbors.ratings),
        jax.device_put(
            neighbors.mean,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("mp")),
        ),
        budget=n, top_p=6, top_n=3,
    )
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(want.predicted), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(top), np.asarray(want.top_n))
    np.testing.assert_array_equal(
        np.asarray(has), np.asarray(want.has_neighbors)
    )
    # budget covers every bucket union -> nothing silently dropped
    assert int(stats["budget_dropped"]) == 0
    assert int(stats["window_dropped"]) == 0
    assert int(stats["unique_candidates"]) > 0
    # SCALE.md's merge-traffic claim, now measured: the all_gather moves
    # S * P * (c + 3) f32-equivalents per query (c ratings + sim + mean
    # each f32, + 1 int32 gid) — never corpus rows
    S, P_, c = 8, 6, queries.ratings.shape[1]
    assert float(stats["ici_bytes_per_query"]) == S * P_ * 4 * (c + 3)


def test_sharded_csr_recommend_reports_truncation():
    """A starving budget must be ACCOUNTED, not silent (VERDICT r2 weak #7)."""
    mesh = make_mesh((1, 8))
    n, c, q = 8 * 16, 12, 24
    nr, nk, nm = _ratings(n, c, seed=1)
    qr, qk, qm = _ratings(q, c, seed=2)
    sharded = build_sharded_index(
        mesh, KEY, shard_corpus(mesh, jnp.asarray(nr)), "cosine", 2, 4
    )
    *_, stats = sharded_recommend_csr(
        mesh, sharded,
        jnp.asarray(qr), jnp.asarray(qk), jnp.asarray(qm),
        shard_corpus(mesh, jnp.asarray(nr)),
        jax.device_put(
            jnp.asarray(nm),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("mp")),
        ),
        budget=4, top_p=4, top_n=3,
    )
    # k=2 buckets are large; a budget of 2 cannot hold their union
    assert int(stats["budget_dropped"]) > 0
    assert int(stats["unique_candidates"]) > int(stats["budget_dropped"])


def test_sharded_csr_recommend_euclidean_detailed():
    """Euclidean metric exercises the detailed-hash filter branch."""
    mesh = make_mesh((1, 8))
    n, c, q = 8 * 16, 10, 16
    nr, nk, nm = _ratings(n, c, seed=5)
    qr, qk, qm = _ratings(q, c, seed=6)
    sharded = build_sharded_index(
        mesh, KEY, shard_corpus(mesh, jnp.asarray(nr)), "euclidean",
        k=3, L=4, lsh_bucket_div=4, euclidean_h_w=4.0,
    )
    assert sharded.detailed is not None
    pred, top, has, sims, gids, stats = sharded_recommend_csr(
        mesh, sharded,
        jnp.asarray(qr), jnp.asarray(qk), jnp.asarray(qm),
        shard_corpus(mesh, jnp.asarray(nr)),
        jax.device_put(
            jnp.asarray(nm),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("mp")),
        ),
        budget=64, top_p=6, top_n=3,
    )
    assert pred.shape == (q, c)
    assert np.asarray(has).any()
    # known cells must keep their ratings
    np.testing.assert_allclose(
        np.asarray(pred)[qk], qr[qk], atol=1e-6
    )
    # global ids within range
    g = np.asarray(gids)
    assert g.max() < n and (g[g >= 0] >= 0).all()


def test_sharded_recommend_scored_kernel_engine():
    """Round-4 scored CF engine: per-shard slab-kernel top-P (no candidate
    sets).  Planted twins must come back as the top neighbor, predictions
    must keep known cells, and the f32-slab scored engine must agree with
    the csr engine's prediction wherever both saw the same top neighbor."""
    from crypto_rec_tpu.parallel.sharded_index import (
        pack_sharded_index, sharded_recommend_scored,
    )

    mesh = make_mesh((1, 8))
    n, c, q = 8 * 64, 128, 16
    rng = np.random.default_rng(9)
    nr, nk, nm = _ratings(n, c, seed=11)
    target = rng.choice(n, size=q, replace=False)
    qr = nr[target] + 1e-3 * rng.normal(size=(q, c)).astype(np.float32)
    qk = np.asarray(np.random.default_rng(12).random((q, c)) < 0.6)
    qm = (qr * qk).sum(1) / np.maximum(qk.sum(1), 1)

    sharded = build_sharded_index(
        mesh, KEY, shard_corpus(mesh, jnp.asarray(nr)), "cosine", 3, 4
    )
    sharded = pack_sharded_index(
        mesh, sharded, shard_corpus(mesh, jnp.asarray(nr)),
        dtype=jnp.float32, pad=512,
    )
    nm_sh = jax.device_put(
        jnp.asarray(nm),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("mp")),
    )
    pred, top, has, sims, gids, stats = sharded_recommend_scored(
        mesh, sharded,
        jnp.asarray(qr), jnp.asarray(qk), jnp.asarray(qm.astype(np.float32)),
        shard_corpus(mesh, jnp.asarray(nr)), nm_sh,
        top_p=6, top_n=3, per_table=64, pallas_interpret=True,
    )
    assert pred.shape == (q, c)
    assert np.asarray(has).all()
    g = np.asarray(gids)
    assert g.max() < n
    # the planted twin is the unambiguous nearest neighbor
    assert (g[:, 0] == target).all()
    s = np.asarray(sims)
    assert (np.diff(np.where(np.isfinite(s), s, -1e9), axis=1) <= 1e-6).all()
    # known cells keep their ratings
    np.testing.assert_allclose(np.asarray(pred)[qk], qr[qk], atol=1e-6)
    # scored engine reports scalar totals (not per-query vectors like csr)
    assert int(stats["scanned_total"]) > 0
    assert int(stats["window_dropped_total"]) == 0


def test_sharded_recommend_scored_int8_dequant():
    """int8 shards: each shard's raw kernel dots are dequantized by ITS
    gscale before the merge — neighbor identity must survive quantization
    and cross-shard sims must stay comparable (planted twin first)."""
    from crypto_rec_tpu.parallel.sharded_index import (
        pack_sharded_index, sharded_recommend_scored,
    )

    mesh = make_mesh((1, 8))
    n, c, q = 8 * 64, 128, 12
    rng = np.random.default_rng(19)
    nr, nk, nm = _ratings(n, c, seed=21)
    target = rng.choice(n, size=q, replace=False)
    qr = nr[target] + 1e-3 * rng.normal(size=(q, c)).astype(np.float32)
    qk = np.asarray(np.random.default_rng(22).random((q, c)) < 0.6)
    qm = ((qr * qk).sum(1) / np.maximum(qk.sum(1), 1)).astype(np.float32)

    sharded = build_sharded_index(
        mesh, KEY, shard_corpus(mesh, jnp.asarray(nr)), "cosine", 3, 4
    )
    sharded = pack_sharded_index(
        mesh, sharded, shard_corpus(mesh, jnp.asarray(nr)),
        dtype=jnp.int8, pad=512,
    )
    assert sharded.packed_gscale is not None
    nm_sh = jax.device_put(
        jnp.asarray(nm),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("mp")),
    )
    pred, top, has, sims, gids, _stats = sharded_recommend_scored(
        mesh, sharded,
        jnp.asarray(qr), jnp.asarray(qk), jnp.asarray(qm),
        shard_corpus(mesh, jnp.asarray(nr)), nm_sh,
        top_p=6, top_n=3, per_table=64, pallas_interpret=True,
    )
    g = np.asarray(gids)
    assert (g[:, 0] == target).all()
    s = np.asarray(sims)
    # dequantized sims are ~cosine: twin sim near 1 within the int8 band
    assert (np.abs(s[:, 0] - 1.0) < 0.05).all()
    np.testing.assert_allclose(np.asarray(pred)[qk], qr[qk], atol=1e-6)


def test_sharded_recommend_scored_euclidean_augmented():
    """Augmented euclidean shards in the scored CF engine (VERDICT r4
    missing #4): each shard ranks its windows by the euclidean rank dot,
    rescoring the survivors with exact cosine — the planted twin must lead
    and the CF weights must be true cosine sims (near 1.0 for the twin)."""
    from crypto_rec_tpu.parallel.sharded_index import (
        pack_sharded_index, sharded_recommend_scored,
    )

    mesh = make_mesh((1, 8))
    n, c, q = 8 * 64, 128, 12
    rng = np.random.default_rng(29)
    nr, nk, nm = _ratings(n, c, seed=31)
    target = rng.choice(n, size=q, replace=False)
    qr = nr[target] + 1e-3 * rng.normal(size=(q, c)).astype(np.float32)
    qk = np.asarray(np.random.default_rng(32).random((q, c)) < 0.6)
    qm = ((qr * qk).sum(1) / np.maximum(qk.sum(1), 1)).astype(np.float32)

    sharded = build_sharded_index(
        mesh, KEY, shard_corpus(mesh, jnp.asarray(nr)), "euclidean", 3, 4,
        lsh_bucket_div=4, euclidean_h_w=8.0,
    )
    sharded = pack_sharded_index(
        mesh, sharded, shard_corpus(mesh, jnp.asarray(nr)),
        dtype=jnp.float32, pad=512, augment=True,
    )
    assert sharded.packed_aug_scale is not None
    nm_sh = jax.device_put(
        jnp.asarray(nm),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("mp")),
    )
    pred, top, has, sims, gids, stats = sharded_recommend_scored(
        mesh, sharded,
        jnp.asarray(qr), jnp.asarray(qk), jnp.asarray(qm),
        shard_corpus(mesh, jnp.asarray(nr)), nm_sh,
        top_p=6, top_n=3, per_table=64, pallas_interpret=True,
    )
    assert np.asarray(has).all()
    g = np.asarray(gids)
    assert (g[:, 0] == target).all()
    s = np.asarray(sims)
    # weights are exact cosine sims of the rescored survivors
    assert (np.abs(s[:, 0] - 1.0) < 1e-3).all()
    assert (np.diff(np.where(np.isfinite(s), s, -1e9), axis=1) <= 1e-6).all()
    np.testing.assert_allclose(np.asarray(pred)[qk], qr[qk], atol=1e-6)
    assert int(stats["scanned_total"]) > 0
