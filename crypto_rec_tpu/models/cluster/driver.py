"""Extended clustering drivers: every init x assignment x update combination
the reference ships (SURVEY.md §2: initialization / assignment / update are
independently pluggable phases).

Reference combinations (/root/reference/main.cpp:93-103 uses k-means++ +
Lloyd + k-means; the unused-but-shipped paths are lsh_range_assignment /
cube_range_assignment (assignment.hpp:108-152) and pam_lloyds
(update.hpp:90-142)).  The LSH/cube index is built ONCE over the input
points; each round queries the current centroids against it — reverse
assignment — exactly as the reference structures it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crypto_rec_tpu.models.cluster.init import kmeans_pp_init, random_init
from crypto_rec_tpu.models.cluster.assign import lloyd_assign, index_range_assign
from crypto_rec_tpu.models.cluster.update import kmeans_update, pam_update
from crypto_rec_tpu.models.cluster.kmeans import KMeansResult
from crypto_rec_tpu.models.lsh.index import build_index, candidate_mask
from crypto_rec_tpu.models.lsh.hypercube import build_hypercube, cube_candidate_mask


def cluster(
    key: jax.Array,
    x: jax.Array,
    k: int,
    metric: str,
    init: str = "kmeans++",          # "kmeans++" | "random"
    assignment: str = "lloyd",        # "lloyd" | "lsh" | "cube"
    update: str = "kmeans",           # "kmeans" | "pam"
    max_iterations: int = 30,
    min_dist: float = 0.05,
    lsh_k: int = 4,
    lsh_l: int = 5,
    lsh_bucket_div: int = 4,
    euclidean_h_w: float = 0.5,
    probes: int = 5,
) -> KMeansResult:
    """General clustering driver over all phase combinations.

    Host-level loop (index-assisted assignment and PAM make the iteration
    data-dependent in ways a single while_loop can't express cleanly); each
    phase call is itself jitted.
    """
    kinit, kindex = jax.random.split(key)
    n = x.shape[0]
    if init == "kmeans++":
        idx = kmeans_pp_init(kinit, x, k, metric)
    elif init == "random":
        idx = random_init(kinit, n, k)
    else:
        raise ValueError(f"unknown init {init!r}")

    index = hypercube = None
    if assignment == "lsh":
        index = build_index(
            kindex, x, metric, lsh_k, lsh_l, lsh_bucket_div, euclidean_h_w
        )
    elif assignment == "cube":
        hypercube = build_hypercube(kindex, x, metric, lsh_k, euclidean_h_w)
    elif assignment != "lloyd":
        raise ValueError(f"unknown assignment {assignment!r}")

    if update == "pam":
        medoids = idx.astype(jnp.int32)
        centroids = x[medoids]
    else:
        centroids = x[idx]

    def assign(c):
        if assignment == "lloyd":
            return lloyd_assign(x, c, metric)
        if assignment == "lsh":
            # reverse assignment queries centroids, unfiltered buckets
            # (get_LSH_combined_buckets, assignment.hpp:117-120)
            mask = candidate_mask(index, c, filtered=False)
            return index_range_assign(x, c, mask, metric)
        mask = cube_candidate_mask(hypercube, c, probes)
        return index_range_assign(x, c, mask, metric)

    labels = dists = None
    iterations = 0
    for _ in range(max_iterations):
        labels, dists = assign(centroids)
        iterations += 1
        if update == "kmeans":
            centroids, cont = kmeans_update(
                x, labels, centroids, k, metric, min_dist
            )
            if not bool(cont):
                break
        else:
            medoids, swapped = pam_update(x, labels, medoids, k, metric)
            centroids = x[medoids]
            if not bool(swapped):
                break

    labels, dists = lloyd_assign(x, centroids, metric)
    return KMeansResult(
        centroids=centroids,
        labels=labels,
        dists=dists,
        iterations=jnp.int32(iterations),
    )
