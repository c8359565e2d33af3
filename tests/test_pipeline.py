"""End-to-end pipeline test: synthetic reference-format dataset in,
recommendations + timings + CV MAE out (mirrors running the reference
binary, main.cpp:36-390)."""

import json
import os

import numpy as np
import pytest

from crypto_rec_tpu.config import load_config
from crypto_rec_tpu.io.synth import write_synthetic_dataset
from crypto_rec_tpu.models.rec.pipeline import run_pipeline


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    tweets, conf = write_synthetic_dataset(str(out), seed=3)
    return tweets, conf, str(out)


def test_config_roundtrip(dataset):
    _tweets, conf, _ = dataset
    cfg = load_config(conf)
    assert cfg.k == 4 and cfg.L == 5
    assert cfg.csv_delimiter == "\t"           # ASCII code 9 (main.cpp:544-546)
    assert cfg.proj2_cluster_num == 10
    assert cfg.cube_probes == 5                # read even though ref drops it


def test_pipeline_end_to_end(dataset, tmp_path):
    tweets, conf, _ = dataset
    out_file = str(tmp_path / "out.txt")
    cfg = load_config(conf)
    result = run_pipeline(tweets, out_file, cfg, validate=True)

    assert result.n_users > 30
    assert result.n_fake_users > 0
    assert result.mae is not None and np.isfinite(result.mae)
    # sane MAE: ratings are O(1) sentiment scores
    assert 0.0 <= result.mae < 2.0

    text = open(out_file).read()
    # four phases, each with a header + timing (reference output format)
    assert text.count("Cosine LSH") == 2
    assert text.count("Clustering Recommendation") == 2
    assert text.count("Execution Time:") == 4
    # recommendation lines carry the display-name column of coins.tsv
    lines = [
        l for l in text.splitlines()
        if l.startswith("user") and not l.startswith("users")
    ]
    assert len(lines) > result.n_users  # >1 phase emits per-user lines
    first = lines[0].split()
    assert first[0].startswith("user")
    assert len(first) >= 2  # at least one recommended coin name


def test_cli_main(dataset, tmp_path, capsys):
    tweets, conf, _ = dataset
    out_file = str(tmp_path / "cli_out.txt")
    from crypto_rec_tpu.main import main

    rc = main(["-d", tweets, "-o", out_file, "-c", conf])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "phase_ms" in summary and summary["n_users"] > 0
    assert os.path.exists(out_file)
