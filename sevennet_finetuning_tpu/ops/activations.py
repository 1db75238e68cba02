"""Activation functions with second-moment normalization (JAX).

e3nn-compatible: non-linearities used inside equivariant nets are rescaled
so that E[act(z)^2] = 1 for z ~ N(0,1), keeping activations unit-variance
(the reference inherits this from e3nn's normalize2mom; its own activation
is ShiftedSoftPlus, reference: sevenn/nn/activation.py:6-8).

The normalization constants are estimated exactly the way e3nn does --
second moment over 1e6 standard normals drawn from a fixed seed -- so that
weights imported from reference checkpoints produce identical outputs.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

_LOG2 = math.log(2.0)


def shifted_softplus(x):
    return jax.nn.softplus(x) - _LOG2


_ACTS = {
    'silu': jax.nn.silu,
    'ssp': shifted_softplus,
    'tanh': jnp.tanh,
    'abs': jnp.abs,
    'relu': jax.nn.relu,
    'sigmoid': jax.nn.sigmoid,
    'elu': jax.nn.elu,
}

_NP_ACTS = {
    'silu': lambda x: x / (1.0 + np.exp(-x)),
    'ssp': lambda x: np.logaddexp(0.0, x) - _LOG2,
    'tanh': np.tanh,
    'abs': np.abs,
    'relu': lambda x: np.maximum(x, 0.0),
    'sigmoid': lambda x: 1.0 / (1.0 + np.exp(-x)),
    'elu': lambda x: np.where(x > 0, x, np.expm1(x)),
}


@lru_cache(maxsize=None)
def moment2_const(name: str) -> float:
    """1/sqrt(E[f(z)^2]), z from the same fixed-seed draw e3nn uses."""
    import torch  # host-side only; replicates e3nn's estimator exactly

    gen = torch.Generator(device='cpu').manual_seed(0)
    z = torch.randn(1_000_000, generator=gen, dtype=torch.float64).numpy()
    m2 = float(np.mean(_NP_ACTS[name](z) ** 2))
    return m2 ** (-0.5)


@lru_cache(maxsize=None)
def get_activation(name: str, normalized: bool = False) -> Callable:
    """Plain or second-moment-normalized activation by name.

    Cached so repeated lookups return the identical callable (specs that
    embed activations stay value-comparable)."""
    base = _ACTS[name]
    if not normalized:
        return base
    c = moment2_const(name)
    return lambda x: base(x) * c


def parity_function(name: str) -> int:
    """+1 if f is even, -1 if odd, 0 otherwise (for gate parity checks)."""
    f = _NP_ACTS[name]
    x = np.linspace(0.0, 10.0, 256)
    a, b = f(x), f(-x)
    if np.allclose(a, b):
        return 1
    if np.allclose(a, -b):
        return -1
    return 0
