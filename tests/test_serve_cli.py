"""Serve CLI e2e: checkpoint an index, restore, answer queries."""

import numpy as np
import jax
import jax.numpy as jnp

from crypto_rec_tpu.checkpoint import save_index, save_user_matrix
from crypto_rec_tpu.io.synth import write_synthetic_dataset
from crypto_rec_tpu.io.users import build_user_matrix
from crypto_rec_tpu.io.native import score_tweets_native
from crypto_rec_tpu.models.lsh.index import build_index
from crypto_rec_tpu.serve_cli import main

RNG = np.random.default_rng(91)


def test_serve_retrieve(tmp_path):
    x = RNG.normal(size=(256, 16)).astype(np.float32)
    index = build_index(
        jax.random.PRNGKey(0), jnp.asarray(x), "cosine", 4, 4, 4, 1.0
    )
    save_index(str(tmp_path / "idx.npz"), index)
    np.savez(tmp_path / "corpus.npz", vectors=x)
    with open(tmp_path / "q.csv", "w") as f:
        for i in range(8):
            f.write(",".join([f"q{i}"] + [f"{v:.5f}" for v in x[i]]) + "\n")
    rc = main([
        "retrieve", "--index", str(tmp_path / "idx.npz"),
        "--corpus", str(tmp_path / "corpus.npz"),
        "--queries", str(tmp_path / "q.csv"),
        "--top-k", "3", "-o", str(tmp_path / "out.tsv"),
    ])
    assert rc == 0
    lines = open(tmp_path / "out.tsv").read().splitlines()
    assert len(lines) == 8
    for i, line in enumerate(lines):
        toks = line.split("\t")
        assert toks[0] == f"q{i}"
        # each query is an exact corpus row -> retrieves itself at sim ~1
        top_row, top_score = toks[1].split(":")
        assert int(top_row) == i
        assert float(top_score) > 0.999


def test_serve_retrieve_corpus_mismatch(tmp_path):
    x = RNG.normal(size=(64, 8)).astype(np.float32)
    index = build_index(
        jax.random.PRNGKey(0), jnp.asarray(x), "cosine", 3, 2, 4, 1.0
    )
    save_index(str(tmp_path / "idx.npz"), index)
    np.savez(tmp_path / "corpus.npz", vectors=x[:32])  # wrong size
    open(tmp_path / "q.csv", "w").write("q0," + ",".join(["0.1"] * 8) + "\n")
    rc = main([
        "retrieve", "--index", str(tmp_path / "idx.npz"),
        "--corpus", str(tmp_path / "corpus.npz"),
        "--queries", str(tmp_path / "q.csv"),
        "-o", str(tmp_path / "out.tsv"),
    ])
    assert rc == 1


def test_serve_recommend(tmp_path):
    ds = tmp_path / "ds"
    write_synthetic_dataset(str(ds), seed=17)
    batch = score_tweets_native(
        f"{ds}/tweets.tsv", f"{ds}/lexicon.tsv", f"{ds}/coins.tsv", "\t"
    )
    um = build_user_matrix(batch)
    save_user_matrix(str(tmp_path / "users.npz"), um)
    rc = main([
        "recommend", "--users", str(tmp_path / "users.npz"),
        "--coins", f"{ds}/coins.tsv", "--top-n", "3",
        "-o", str(tmp_path / "rec.txt"),
    ])
    assert rc == 0
    lines = open(tmp_path / "rec.txt").read().splitlines()
    assert len(lines) > 10
    assert all(l.split()[0].startswith("user") for l in lines)


def test_serve_retrieve_packed(tmp_path):
    """--pack restores then packs; answers must match the unpacked serve."""
    x = RNG.normal(size=(256, 16)).astype(np.float32)
    index = build_index(
        jax.random.PRNGKey(0), jnp.asarray(x), "cosine", 4, 4, 4, 1.0
    )
    save_index(str(tmp_path / "idx.npz"), index)
    np.savez(tmp_path / "corpus.npz", vectors=x)
    with open(tmp_path / "q.csv", "w") as f:
        for i in range(8):
            f.write(",".join([f"q{i}"] + [f"{v:.5f}" for v in x[i]]) + "\n")
    base = [
        "retrieve", "--index", str(tmp_path / "idx.npz"),
        "--corpus", str(tmp_path / "corpus.npz"),
        "--queries", str(tmp_path / "q.csv"), "--top-k", "3",
    ]
    assert main(base + ["-o", str(tmp_path / "plain.tsv")]) == 0
    assert main(base + ["--pack", "-o", str(tmp_path / "packed.tsv")]) == 0
    plain = [l.split("\t") for l in open(tmp_path / "plain.tsv")]
    packed = [l.split("\t") for l in open(tmp_path / "packed.tsv")]
    for p, g in zip(plain, packed):
        assert p[0] == g[0]
        # same neighbor ids (bf16 scores may differ in low digits)
        assert [t.split(":")[0] for t in p[1:]] == [t.split(":")[0] for t in g[1:]]


def test_serve_retrieve_packed_checkpoint_no_repack(tmp_path, capsys, monkeypatch):
    """A v2 packed checkpoint serves --pack WITHOUT re-packing (VERDICT r1 #4)."""
    from crypto_rec_tpu.models.lsh import index as index_mod
    from crypto_rec_tpu.models.lsh.index import pack_index

    x = RNG.normal(size=(256, 16)).astype(np.float32)
    index = build_index(
        jax.random.PRNGKey(0), jnp.asarray(x), "cosine", 4, 4, 4, 1.0
    )
    index = pack_index(index, jnp.asarray(x), dtype=jnp.int8, pad=512)
    save_index(str(tmp_path / "idx.npz"), index)
    np.savez(tmp_path / "corpus.npz", vectors=x)
    with open(tmp_path / "q.csv", "w") as f:
        for i in range(4):
            f.write(",".join([f"q{i}"] + [f"{v:.5f}" for v in x[i]]) + "\n")

    def boom(*a, **kw):
        raise AssertionError("pack_index must not be called on a packed checkpoint")

    monkeypatch.setattr(index_mod, "pack_index", boom)
    rc = main([
        "retrieve", "--index", str(tmp_path / "idx.npz"),
        "--corpus", str(tmp_path / "corpus.npz"),
        "--queries", str(tmp_path / "q.csv"),
        "--top-k", "3", "--per-table", "64", "--pack",
        "-o", str(tmp_path / "out.tsv"),
    ])
    assert rc == 0
    assert "restored packed slabs" in capsys.readouterr().err
    lines = open(tmp_path / "out.tsv").read().splitlines()
    assert len(lines) == 4
    for i, line in enumerate(lines):
        top_row, top_score = line.split("\t")[1].split(":")
        assert int(top_row) == i and float(top_score) > 0.999
