"""Scalar MLP with e3nn FullyConnectedNet semantics (JAX).

The radial weight network of the convolution and the optional FCN readout
(reference: sevenn/nn/convolution.py:97-100, sevenn/nn/linear.py:93-129).
Each layer computes act(x @ W / sqrt(fan_in)) with a second-moment
normalized activation; the final layer has no activation.
Weights are standard-normal at init (variance handled by the 1/sqrt(fan)).
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np
from jax import lax

from .activations import get_activation

from .precision import matmul_precision


def mlp_init(hs: Sequence[int], rng: np.random.Generator) -> List[np.ndarray]:
    return [
        rng.standard_normal((h_in, h_out)).astype(np.float32)
        for h_in, h_out in zip(hs[:-1], hs[1:])
    ]


def mlp_apply(
    weights: Sequence[jnp.ndarray],
    x: jnp.ndarray,
    act_name: str,
) -> jnp.ndarray:
    act = get_activation(act_name, normalized=True)
    n = len(weights)
    for i, w in enumerate(weights):
        h_in = w.shape[0]
        x = jnp.matmul(
            x, w.astype(x.dtype) / math.sqrt(h_in), precision=matmul_precision()
        )
        if i < n - 1:
            x = act(x)
    return x


def mlp_apply_T(
    weights: Sequence[jnp.ndarray],
    x_T: jnp.ndarray,
    act_name: str,
) -> jnp.ndarray:
    """Feature-major variant: x_T is [features, batch]; same math as
    ``mlp_apply`` with the transposition folded into the matmuls (the
    fused convolution consumes per-edge weights feature-major)."""
    act = get_activation(act_name, normalized=True)
    n = len(weights)
    for i, w in enumerate(weights):
        h_in = w.shape[0]
        x_T = jnp.matmul(
            jnp.swapaxes(w.astype(x_T.dtype), 0, 1) / math.sqrt(h_in),
            x_T, precision=matmul_precision()
        )
        if i < n - 1:
            x_T = act(x_T)
    return x_T
