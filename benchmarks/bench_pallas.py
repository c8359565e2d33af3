"""Pallas-vs-XLA microbenchmarks on the real TPU.

Validates that the compiled (non-interpret) kernels produce identical
results on hardware and compares wall-clock against the XLA paths.
Prints one JSON line with both timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from crypto_rec_tpu.utils.timing import hard_sync
import jax.numpy as jnp


def timed(fn, reps=5):
    out = fn()
    hard_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from crypto_rec_tpu.models.lsh.hyperplane import CosineLsh
    from crypto_rec_tpu.ops.pallas.signproj import signproj_bucket_ids

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", file=sys.stderr)

    N, D, K, L = int(os.environ.get("BP_N", 2_000_000)), 128, 10, 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    fam = CosineLsh.create(jax.random.PRNGKey(1), D, K, L)

    want = fam.bucket_ids(x)
    got = signproj_bucket_ids(x, fam.proj, K, L, interpret=not on_tpu)
    assert np.array_equal(np.asarray(want), np.asarray(got)), "signproj mismatch"

    t_xla = timed(lambda: fam.bucket_ids(x))
    t_pl = timed(lambda: signproj_bucket_ids(x, fam.proj, K, L, interpret=not on_tpu))
    print(f"signproj: xla {t_xla*1e3:.1f} ms, pallas {t_pl*1e3:.1f} ms",
          file=sys.stderr)

    print(json.dumps({
        "metric": "pallas_signproj_ms",
        "signproj_xla_ms": round(t_xla * 1e3, 2),
        "signproj_pallas_ms": round(t_pl * 1e3, 2),
        "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
