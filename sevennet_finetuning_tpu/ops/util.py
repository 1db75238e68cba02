"""Small numeric utilities shared by the equivariant ops."""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(v: jnp.ndarray, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm whose gradient is exactly zero (not NaN) at v = 0.

    Padded edges of the static TPU batch layout can carry zero vectors;
    plain jnp.linalg.norm yields NaN in the backward pass there, which
    would poison force training even though the edges are masked out.
    sqrt(max(sum v^2, eps^2)) is exact for any real edge (r >> eps).
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))
