"""Deterministic dataset shared by the 2-process multihost workers and the
single-process reference (tests/test_multihost.py): every process constructs
the identical arrays, so the only variable is the process topology."""

import numpy as np

N, D, Q = 1024, 16, 32


def make_data():
    rng = np.random.default_rng(71)
    centers = rng.normal(size=(8, D)).astype(np.float32) * 4
    corpus = (
        centers[rng.integers(0, 8, size=N)]
        + 0.1 * rng.normal(size=(N, D))
    ).astype(np.float32)
    queries = (corpus[:Q] + 0.01 * rng.normal(size=(Q, D))).astype(np.float32)
    known = rng.random((N, D)) < 0.7
    mean = (
        (corpus * known).sum(1) / np.maximum(known.sum(1), 1)
    ).astype(np.float32)
    return corpus, queries, known, mean
