"""Fused sign-projection + bit-pack Pallas kernel.

Computes hyperplane-LSH bucket ids for a row block in one pass:
    acc  = x_block @ proj            (MXU, f32 accumulate)
    bits = acc >= 0
    out  = bits @ pack               (MXU; pack is block-diagonal powers of 2)

versus the XLA path (models/lsh/hyperplane.py) which writes the [n, L*k]
sign tensor to HBM between ops when fusion misses.  The fused kernel's HBM
traffic is x (read) + [n, L] int32 (write) — the 4k-fold intermediate never
leaves VMEM.

Reference semantics: cosine_g_gen.hpp:62-72 (MSB-first packing of k sign
bits per table, L tables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_matrix(k: int, L: int) -> np.ndarray:
    """[L*k, L] block-diagonal: column l holds 2^(k-1-j) at rows l*k+j."""
    m = np.zeros((L * k, L), np.float32)
    for l in range(L):
        for j in range(k):
            m[l * k + j, l] = float(1 << (k - 1 - j))
    return m


def _kernel(x_ref, proj_ref, pack_ref, out_ref):
    acc = jnp.dot(x_ref[:], proj_ref[:], preferred_element_type=jnp.float32)
    bits = (acc >= 0.0).astype(jnp.float32)
    packed = jnp.dot(bits, pack_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = packed.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "L", "block_rows", "interpret")
)
def signproj_bucket_ids(
    x: jax.Array,
    proj: jax.Array,
    k: int,
    L: int,
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[n, d] x [d, L*k] -> [n, L] int32 bucket ids (MSB-first pack)."""
    n, d = x.shape
    pad = (-n) % block_rows
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
    pack = jnp.asarray(_pack_matrix(k, L))

    out = pl.pallas_call(
        _kernel,
        grid=(xp.shape[0] // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, L * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L * k, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], L), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * d * L * k + 2 * xp.shape[0] * L * k * L,
            bytes_accessed=xp.shape[0] * d * 4 + xp.shape[0] * L * 4,
            transcendentals=0,
        ),
    )(xp, proj.astype(jnp.float32), pack)
    return out[:n]
