"""p-stable (euclidean / E2LSH) LSH.

Reference semantics:
* one h-function: v ~ N(0,1)^d, t ~ U(0, w); h(x) = floor((v.x + t) / w)
  (/root/reference/lib/generators/euclidean_h_gen.hpp:58-82);
* one phi (g) function: k h's plus random integer weights r_i in [0, 100];
  phi(x) = mod(sum_i mod(r_i * h_i, M), M) with M "2^32 - 5"
  (euclidean_phi_gen.hpp:60-97).  The reference's `int M = pow(2,32)-5`
  overflows int (impl-defined constant) and the products overflow too —
  its "modular" hash is really wrap-around arithmetic.  We use deliberate
  int32 wrap-around multiply-add (the same class of hash, well-distributed,
  and deterministic) rather than replicating accidental UB;
* the table keeps each inserted vector's k h-values ("detailed hash") so a
  query only matches bucket members whose full k-tuple equals its own
  (euclidean_phi_gen.hpp:83-94, cust_hashtable.hpp:73-103).

TPU-first: h-values for all n vectors, L tables and k functions come from a
single [n, d] x [d, L*k] matmul + floor; phi is a tiny weighted reduction.
The "detailed hash" filter becomes an all-k equality mask computed in the
query kernel — no per-id hash-map lookups.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("proj", "offsets", "weights"),
    meta_fields=("w", "k", "L"),
)
@dataclasses.dataclass
class PStableLsh:
    proj: jax.Array     # [d, L * k] float32 v-vectors
    offsets: jax.Array  # [L, k] float32 t ~ U(0, w)
    weights: jax.Array  # [L, k] int32 r ~ U{0..100} (euclidean_phi_gen.hpp:63-68)
    w: float
    k: int
    L: int

    @classmethod
    def create(cls, key: jax.Array, dim: int, k: int, L: int, w: float) -> "PStableLsh":
        kp, kt, kr = jax.random.split(key, 3)
        proj = jax.random.normal(kp, (dim, L * k), dtype=jnp.float32)
        offsets = jax.random.uniform(kt, (L, k), dtype=jnp.float32, maxval=w)
        weights = jax.random.randint(kr, (L, k), 0, 101, dtype=jnp.int32)
        return cls(proj=proj, offsets=offsets, weights=weights, w=float(w), k=k, L=L)

    def hash_values(self, x: jax.Array) -> jax.Array:
        """[n, d] -> [n, L, k] int32 h-values: floor((v.x + t) / w)."""
        dots = jnp.dot(
            x.astype(jnp.float32), self.proj, preferred_element_type=jnp.float32
        ).reshape(x.shape[0], self.L, self.k)
        return jnp.floor((dots + self.offsets[None]) / self.w).astype(jnp.int32)

    def bucket_ids(self, x: jax.Array, n_buckets: int) -> jax.Array:
        """[n, d] -> [n, L] int32 bucket ids in [0, n_buckets)."""
        h = self.hash_values(x)
        return self.bucket_ids_from_hashes(h, n_buckets)

    def bucket_ids_from_hashes(self, h: jax.Array, n_buckets: int) -> jax.Array:
        """phi over precomputed h-values [n, L, k] -> [n, L]."""
        # int32 wrap-around weighted sum (see module docstring), then a
        # nonnegative mod into the table (utils.hpp:97-98 `mod`).
        phi = jnp.sum(h * self.weights[None], axis=-1, dtype=jnp.int32)
        return jnp.remainder(phi, jnp.int32(n_buckets))
