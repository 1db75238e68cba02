"""Losses: per-atom energy, force, stress (kbar), and the EWC penalty.

JAX re-design of the reference loss system (reference:
sevenn/train/loss.py:8-309).  Reductions are masked means over static
padded batches: a mask combines (a) padding, (b) NaN labels ("unlabeled",
which the reference filters out by boolean indexing -- impossible under
XLA's static shapes, identical in value here).  Optional per-structure
data weights multiply elementwise before the mean, matching the
reference's weighted criterion path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import keys as K

TO_KBAR = 1602.1766208


def _criterion(name: str, **params) -> Callable:
    name = name.lower()
    if name == 'mse':
        return lambda p, r: (p - r) ** 2
    if name == 'huber':
        delta = float(params.get('delta', 1.0))

        def huber(p, r):
            a = jnp.abs(p - r)
            return jnp.where(
                a < delta, 0.5 * a * a, delta * (a - 0.5 * delta)
            )

        return huber
    raise ValueError(f'unknown loss: {name}')


def _masked_mean(err, mask, weights=None):
    mask = mask.astype(err.dtype)
    if weights is not None:
        err = err * weights
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(err * mask) / denom


@dataclass(frozen=True)
class LossSpec:
    """One term of the training objective."""

    name: str          # 'Energy' | 'Force' | 'Stress' | 'EWC' | custom
    weight: float
    criterion: str = 'mse'
    criterion_params: Tuple[Tuple[str, float], ...] = ()
    # plugin terms (loss: 'custom'): fn(params, output_dict) -> scalar
    custom_fn: Optional[Callable] = None


def energy_loss(out: Dict, crit: Callable, weights=None) -> jnp.ndarray:
    natoms = jnp.maximum(out[K.NUM_ATOMS], 1).astype(
        out[K.PRED_TOTAL_ENERGY].dtype
    )
    pred = out[K.PRED_TOTAL_ENERGY] / natoms
    ref = out[K.ENERGY] / natoms
    mask = jnp.isfinite(ref) & (out[K.NUM_ATOMS] > 0)
    ref = jnp.where(mask, ref, 0.0)
    return _masked_mean(crit(pred, ref), mask, weights)


def force_loss(out: Dict, crit: Callable, weights=None) -> jnp.ndarray:
    pred = out[K.PRED_FORCE]
    ref = out[K.FORCE]
    mask = jnp.isfinite(ref) & (out[K.NODE_MASK][:, None] > 0)
    ref = jnp.where(mask, ref, 0.0)
    w = None if weights is None else weights[out[K.BATCH]][:, None]
    return _masked_mean(crit(pred, ref), mask, w)


def stress_loss(out: Dict, crit: Callable, weights=None) -> jnp.ndarray:
    pred = out[K.PRED_STRESS] * TO_KBAR
    ref = out[K.STRESS] * TO_KBAR
    mask = jnp.isfinite(ref) & (out[K.NUM_ATOMS][:, None] > 0)
    ref = jnp.where(mask, ref, 0.0)
    w = None if weights is None else weights[:, None]
    return _masked_mean(crit(pred, ref), mask, w)


def ewc_penalty(params, fisher, opt_params) -> jnp.ndarray:
    """sum_i F_i (theta_i - theta*_i)^2 over all matching leaves
    (reference: sevenn/train/loss.py:250-265)."""
    leaves_p = jax.tree_util.tree_leaves_with_path(params)
    fisher_flat = dict(jax.tree_util.tree_leaves_with_path(fisher))
    opt_flat = dict(jax.tree_util.tree_leaves_with_path(opt_params))
    total = 0.0
    for path, p in leaves_p:
        if path in fisher_flat and path in opt_flat:
            total = total + jnp.sum(
                fisher_flat[path] * (p - opt_flat[path]) ** 2
            )
    return total


def build_loss_fn(
    loss_specs: Tuple[LossSpec, ...],
    use_data_weights: bool = False,
    fisher=None,
    opt_params=None,
):
    """Compose the total objective: sum_i w_i * L_i(output).

    Returns f(params, output_dict) -> (total, {name: value}).  ``params``
    enters only through the EWC term (weight = lambda/2, reference:
    sevenn/train/loss.py:298-307).
    """
    crits = {}
    for ls in loss_specs:
        if ls.name != 'EWC' and ls.custom_fn is None:
            crits[ls.name] = _criterion(
                ls.criterion, **dict(ls.criterion_params)
            )

    def loss_fn(params, out):
        terms = {}
        total = 0.0
        for ls in loss_specs:
            if ls.custom_fn is not None:
                v = ls.custom_fn(params, out)
            elif ls.name == 'Energy':
                w = out.get(K.DATA_WEIGHT, {}).get(K.PER_ATOM_ENERGY) \
                    if use_data_weights else None
                v = energy_loss(out, crits[ls.name], w)
            elif ls.name == 'Force':
                w = out.get(K.DATA_WEIGHT, {}).get(K.FORCE) \
                    if use_data_weights else None
                v = force_loss(out, crits[ls.name], w)
            elif ls.name == 'Stress':
                w = out.get(K.DATA_WEIGHT, {}).get(K.STRESS) \
                    if use_data_weights else None
                v = stress_loss(out, crits[ls.name], w)
            elif ls.name == 'EWC':
                v = ewc_penalty(params, fisher, opt_params)
            else:
                raise ValueError(ls.name)
            terms[ls.name] = v
            total = total + ls.weight * v
        return total, terms

    return loss_fn


def loss_specs_from_config(config: Dict) -> Tuple[LossSpec, ...]:
    """Reference semantics: energy weight 1, force/stress weights from
    config, optional EWC with weight lambda/2 (reference:
    sevenn/train/loss.py:268-309)."""
    name = config.get(K.LOSS, 'mse')
    if str(name).lower() == 'custom':
        # plugin hook (reference: sevenn/train/loss.py:312-321):
        # loss_param = {path, module, function}; the callback receives
        # the config and returns [(term_name, weight, fn)] with
        # fn(params, output_dict) -> scalar jnp loss
        from ..model.build import _load_callback

        callback = _load_callback(**config.get(K.LOSS_PARAM, {}))
        terms = callback(config)
        specs = [
            LossSpec(n, float(w), 'custom', custom_fn=fn)
            for n, w, fn in terms
        ]
        cont = config.get(K.CONTINUE, {})
        if cont.get(K.FISHER) and cont.get(K.OPT_PARAMS):
            lam = float(cont.get(K.EWC_LAMBDA, 0.0))
            specs.append(LossSpec('EWC', lam / 2.0))
        return tuple(specs)
    lp = tuple(sorted(config.get(K.LOSS_PARAM, {}).items()))
    specs: List[LossSpec] = [
        LossSpec('Energy', 1.0, name, lp),
        LossSpec('Force', float(config.get(K.FORCE_WEIGHT, 0.1)), name, lp),
    ]
    if config.get(K.IS_TRAIN_STRESS, False):
        specs.append(
            LossSpec('Stress', float(config.get(K.STRESS_WEIGHT, 1e-6)),
                     name, lp)
        )
    cont = config.get(K.CONTINUE, {})
    if cont.get(K.FISHER) and cont.get(K.OPT_PARAMS):
        lam = float(cont.get(K.EWC_LAMBDA, 0.0))
        specs.append(LossSpec('EWC', lam / 2.0))
    return tuple(specs)
