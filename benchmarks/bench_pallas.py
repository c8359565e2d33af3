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
    from crypto_rec_tpu.ops.pallas.gather import gather_bucket_windows

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

    # gather kernel: correctness on hardware
    Ln, n, W, q = 4, 1 << 16, 128, 4096
    rows = jnp.asarray(
        np.stack([np.random.default_rng(i).permutation(n) for i in range(Ln)]
                 ).astype(np.int32)
    )
    starts = jax.random.randint(jax.random.PRNGKey(2), (q, Ln), 0, n, jnp.int32)
    sizes = jax.random.randint(jax.random.PRNGKey(3), (q, Ln), 0, W + 1, jnp.int32)
    sizes = jnp.minimum(sizes, n - starts)  # CSR invariant: start+size <= n
    got_g = gather_bucket_windows(rows, starts, sizes, window=W, interpret=not on_tpu)
    # XLA reference
    offs = starts[:, :, None] + jnp.arange(W)[None, None, :]
    ref = jnp.where(
        (jnp.arange(W)[None, None, :] < sizes[:, :, None]) & (offs < n),
        jnp.take_along_axis(
            rows[None].repeat(q, 0), jnp.minimum(offs, n - 1), axis=2
        ),
        n,
    )
    # kernel masks only by size; entries beyond n within size come from the
    # padded tail (= n), matching where() above
    assert np.array_equal(np.asarray(got_g), np.asarray(ref)), "gather mismatch"
    t_gx = timed(lambda: jnp.where(
        (jnp.arange(W)[None, None, :] < sizes[:, :, None]) & (offs < n),
        jnp.take_along_axis(rows[None].repeat(q, 0), jnp.minimum(offs, n - 1), axis=2),
        n))
    t_gp = timed(lambda: gather_bucket_windows(rows, starts, sizes, window=W,
                                               interpret=not on_tpu))
    print(f"gather: xla {t_gx*1e3:.1f} ms, pallas {t_gp*1e3:.1f} ms",
          file=sys.stderr)

    print(json.dumps({
        "metric": "pallas_signproj_ms",
        "signproj_xla_ms": round(t_xla * 1e3, 2),
        "signproj_pallas_ms": round(t_pl * 1e3, 2),
        "gather_xla_ms": round(t_gx * 1e3, 2),
        "gather_pallas_ms": round(t_gp * 1e3, 2),
        "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
