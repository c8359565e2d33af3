import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from crypto_rec_tpu.models.lsh.index import build_index, pack_index
from crypto_rec_tpu.ops.pallas.slabscore import slab_window_scores

rng = np.random.default_rng(0)
n, d, q, L, PT = 2048, 128, 24, 5, 200
x = rng.normal(size=(n, d)).astype(np.float32)
idx = build_index(jax.random.PRNGKey(1), jnp.asarray(x), "cosine", k=5, L=L,
                  lsh_bucket_div=4, euclidean_h_w=1.0)
for dtype in (jnp.bfloat16, jnp.int8):
    pidx = pack_index(idx, jnp.asarray(x), dtype=dtype, pad=512)
    Lx, n_pad, _ = pidx.packed.shape
    qs = jnp.asarray(x[:q])
    qn = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
    qb = idx.family.bucket_ids(qs)
    l_idx = jnp.arange(L)
    start = pidx.bucket_starts[l_idx[None, :], qb]
    end = pidx.bucket_starts[l_idx[None, :], qb + 1]
    s0 = start
    sizes = jnp.minimum(end - s0, PT)
    dots, ids = slab_window_scores(
        pidx.packed, pidx.packed_rows, pidx.packed_scale,
        s0, sizes, qn, per_table=PT, q_tile=8, interpret=True)
    dots, ids = np.asarray(dots), np.asarray(ids)
    # reference: dequantized slab dot
    pk = np.asarray(pidx.packed, np.float32)
    if pidx.packed_scale is not None:
        pk = pk * np.asarray(pidx.packed_scale)[:, :, None]
    prows = np.asarray(pidx.packed_rows)
    qn_np = np.asarray(qn)
    s0n, szn = np.asarray(jnp.minimum(s0, n_pad - dots.shape[-1])), np.asarray(sizes)
    for qi in range(q):
        for l in range(L):
            a, sz = s0n[qi, l], min(szn[qi, l], PT)
            want = pk[l, a:a + sz] @ qn_np[qi]
            got = dots[qi, l, :sz]
            np.testing.assert_allclose(got, want, atol=2e-3), (qi, l)
            assert np.array_equal(ids[qi, l, :sz], prows[l, a:a + sz])
            assert np.all(ids[qi, l, sz:] == -1)
            assert np.all(np.isneginf(dots[qi, l, sz:]))
    print(f"{dtype.__name__}: OK")
