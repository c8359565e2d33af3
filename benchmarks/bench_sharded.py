"""Sharded-retrieval scaling benchmark (BASELINE.json config 4 analog).

Runs the (dp, mp) sharded recommend and the all-to-all routed top-k on a
device mesh and reports per-configuration throughput.  On this testbed only
one real chip exists, so by default this runs on an 8-virtual-device CPU
mesh — validating the sharded code path end-to-end and giving a scaling
*shape* (not absolute chip numbers); on a real v5e-8 the same script
measures true multi-chip throughput.

Usage: python benchmarks/bench_sharded.py [--devices 8] [--rows 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--top-p", type=int, default=16)
    ap.add_argument("--cpu", action="store_true", default=False,
                    help="force the simulated CPU mesh (default when <2 real devices)")
    args = ap.parse_args()

    # The platform choice must land BEFORE the first backend initialization
    # (XLA reads --xla_force_host_platform_device_count at CPU client
    # creation), so set env first and, in the auto-detect case, re-exec.
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif len(jax.devices()) < 2:
        print("<2 real devices: re-running on the simulated CPU mesh",
              file=sys.stderr)
        os.execv(sys.executable,
                 [sys.executable, os.path.abspath(__file__)]
                 + sys.argv[1:] + ["--cpu"])

    from crypto_rec_tpu.utils.timing import hard_sync

    import jax.numpy as jnp
    import numpy as np
    from crypto_rec_tpu.models.rec.engine import RatingSet, recommend
    from crypto_rec_tpu.parallel.mesh import make_mesh
    from crypto_rec_tpu.parallel.sharded import shard_rating_set, sharded_recommend

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    kq, kn, km = jax.random.split(key, 3)
    C = args.dim
    q_r = jnp.abs(jax.random.normal(kq, (args.queries, C), jnp.float32))
    n_r = jnp.abs(jax.random.normal(kn, (args.rows, C), jnp.float32))
    mk = jax.random.uniform(km, (args.queries, args.rows)) < 0.05
    queries = RatingSet(q_r, q_r > 0.5, jnp.mean(q_r, axis=1))
    neighbors = RatingSet(n_r, n_r > 0.5, jnp.mean(n_r, axis=1))

    results = {}
    # single-device baseline
    t0 = time.perf_counter()
    rec1 = recommend(queries, neighbors, mk, top_p=args.top_p, top_n=5)
    hard_sync(rec1.predicted)
    t0 = time.perf_counter()
    rec1 = recommend(queries, neighbors, mk, top_p=args.top_p, top_n=5)
    hard_sync(rec1.predicted)
    results["single"] = time.perf_counter() - t0

    for mp in (2, 4, len(devs)):
        if mp > len(devs):
            continue
        mesh = make_mesh((1, mp), devices=devs[:mp])
        nb = shard_rating_set(mesh, neighbors, "mp")
        rec = sharded_recommend(mesh, queries, nb, mk, top_p=args.top_p, top_n=5)
        hard_sync(rec.predicted)
        t0 = time.perf_counter()
        rec = sharded_recommend(mesh, queries, nb, mk, top_p=args.top_p, top_n=5)
        hard_sync(rec.predicted)
        results[f"mp={mp}"] = time.perf_counter() - t0
        # parity vs single-device
        np.testing.assert_allclose(
            np.asarray(rec.predicted), np.asarray(rec1.predicted), atol=1e-3
        )

    out = {
        "metric": "sharded_recommend_s",
        "queries": args.queries,
        "rows": args.rows,
        "platform": devs[0].platform,
        "timings_s": {k: round(v, 4) for k, v in results.items()},
        "qps": {k: round(args.queries / v, 1) for k, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
