"""Real spherical harmonics in the e3nn basis, as JAX ops.

Replaces the reference's e3nn ``SphericalHarmonics`` edge encoding
(reference: sevenn/nn/edge_embedding.py:176-198).  The basis is generated
from first principles by the Wigner-3j recursion

    Y_l  propto  w3j(l-1, 1, l) : (Y_{l-1} x Y_1),      Y_1 = (x, y, z)

normalized so that the m=0 component equals +1 at the pole (0, 1, 0) --
which reproduces e3nn's generated polynomial basis exactly (y is the polar
axis; verified against the reference's deployed TorchScript constants).

Everything shape-static and jit-friendly; coefficients are host-side
numpy constants closed over by the returned function.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax.numpy as jnp
import numpy as np
from jax import lax

from .util import safe_norm
from .wigner import wigner_3j

from .precision import matmul_precision

_POLE = np.array([0.0, 1.0, 0.0])


@lru_cache(maxsize=None)
def _recursion_scales(lmax: int) -> tuple:
    """Per-l scale c_l s.t. sh_l = c_l * w3j-combine(sh_{l-1}, sh_1)."""
    scales = []
    prev = np.array([1.0])  # l=0 value at pole
    y1 = _POLE.copy()
    for l in range(1, lmax + 1):
        w = wigner_3j(l - 1, 1, l)
        raw = np.einsum('abk,a,b->k', w, prev, y1)
        c = 1.0 / raw[l]  # m=0 component at pole must be +1
        scales.append(c)
        prev = raw * c
    return tuple(scales)


def spherical_harmonics(
    lmax: int,
    normalize: bool = True,
    normalization: str = 'component',
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns f(vec[..., 3]) -> sh[..., (lmax+1)^2] in e3nn layout/order."""
    assert normalization in ('component', 'norm', 'integral')
    scales = _recursion_scales(lmax) if lmax >= 1 else ()
    w3js = [np.asarray(wigner_3j(l - 1, 1, l)) for l in range(1, lmax + 1)]

    comp_mult = []
    for l in range(lmax + 1):
        if normalization == 'component':
            m = np.sqrt(2 * l + 1)
        elif normalization == 'norm':
            m = 1.0
        else:  # integral
            m = np.sqrt((2 * l + 1) / (4 * np.pi))
        comp_mult.append(np.full(2 * l + 1, m))
    comp_mult = np.concatenate(comp_mult)

    def f(vec: jnp.ndarray) -> jnp.ndarray:
        if normalize:
            vec = vec / safe_norm(vec, keepdims=True)
        blocks = [jnp.ones(vec.shape[:-1] + (1,), vec.dtype)]
        if lmax >= 1:
            prev = vec
            blocks.append(prev)
            for l in range(2, lmax + 1):
                w = jnp.asarray(
                    w3js[l - 1] * scales[l - 1], dtype=vec.dtype
                )
                prev = jnp.einsum(
                    '...a,...b,abk->...k', prev, vec, w,
                    precision=matmul_precision(),
                )
                blocks.append(prev)
        sh = jnp.concatenate(blocks, axis=-1)
        return sh * jnp.asarray(comp_mult, dtype=vec.dtype)

    return f
