"""Cluster CLI e2e: reference-format vectors in, cluster report out."""


from crypto_rec_tpu.cluster_cli import main
from crypto_rec_tpu.io.synth import write_synthetic_dataset


def test_cluster_cli_end_to_end(tmp_path):
    ds = tmp_path / "ds"
    write_synthetic_dataset(str(ds), seed=7)
    out = tmp_path / "clusters.txt"
    rc = main([
        "-i", str(ds / "proj2.csv"), "-o", str(out),
        "--clusters", "5", "--metric", "cosine",
    ])
    assert rc == 0
    text = out.read_text()
    assert text.count("CLUSTER-") == 5
    assert "Silhouette: [" in text
    assert "clustering_time:" in text
    sizes = [
        int(l.split("size: ")[1].split(",")[0].rstrip("}"))
        for l in text.splitlines() if l.startswith("CLUSTER-")
    ]
    assert sum(sizes) == 400


def test_cluster_cli_complete_mode(tmp_path):
    ds = tmp_path / "ds"
    write_synthetic_dataset(str(ds), seed=8, n_tweets=100)
    out = tmp_path / "c.txt"
    rc = main([
        "-i", str(ds / "proj2.csv"), "-o", str(out),
        "--clusters", "3", "--metric", "euclidean", "--complete",
        "--update", "pam",
    ])
    assert rc == 0
    assert "members: [" in out.read_text()


def test_cluster_cli_missing_file(tmp_path):
    rc = main(["-i", str(tmp_path / "nope.csv"), "-o", str(tmp_path / "o.txt")])
    assert rc == 1
