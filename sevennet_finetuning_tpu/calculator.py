"""Single-point calculator: structures -> energy / forces / stress.

Counterpart of the reference's ASE calculator (reference:
sevenn/sevennet_calculator.py:17-157) without the ase dependency: builds
a padded graph per call (bucketed capacities so jit recompiles are rare)
and runs the jitted model.  Works from a training checkpoint, a ModelSpec
+ params pair, or an imported reference TorchScript artifact.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from . import keys as K
from .data.vasp import Structure
from .model.graph import bucket_capacity, collate, structure_to_graph
from .model.nequip import ModelSpec, Params, apply_model
from .train.metrics import STRESS_COEFF_KBAR


class Calculator:
    def __init__(self, spec: ModelSpec, params: Params):
        import jax
        import jax.numpy as jnp

        self.spec = spec
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.type_map = dict(spec.type_map)
        self._fwd_cache: Dict[Tuple[int, int], object] = {}

    @classmethod
    def from_checkpoint(cls, path: str) -> 'Calculator':
        from .train.checkpoint import model_from_checkpoint

        spec, params, _ = model_from_checkpoint(path)
        return cls(spec, params)

    @classmethod
    def from_deployed_torchscript(
        cls, path: str, config_overrides: Optional[Dict] = None
    ) -> 'Calculator':
        from .compat.torchscript_import import import_deployed_serial

        spec, params, _, _ = import_deployed_serial(path, config_overrides)
        return cls(spec, params)

    def _forward(self, n_node: int, n_edge: int):
        import jax

        key = (n_node, n_edge)
        if key not in self._fwd_cache:
            spec, params = self.spec, self.params
            self._fwd_cache[key] = jax.jit(
                lambda b: apply_model(spec, params, b)
            )
        return self._fwd_cache[key]

    def calculate(self, s: Structure) -> Dict[str, np.ndarray]:
        """energy (eV), energies (eV/atom), forces (eV/A),
        stress (eV/A^3 Voigt xx yy zz xy yz zx) and stress_kbar."""
        import jax.numpy as jnp

        g = structure_to_graph(s, self.spec.cutoff, self.type_map)
        n_node = bucket_capacity(len(s), margin=1.0)
        n_edge = bucket_capacity(g[K.EDGE_IDX].shape[1])
        b = collate([g], n_node=n_node, n_edge=n_edge, n_graph=1)
        b = {k: jnp.asarray(v) for k, v in b.items()
             if k not in (K.INFO, K.USER_LABEL)}
        out = self._forward(n_node, n_edge)(b)
        n = len(s)
        stress = np.asarray(out[K.PRED_STRESS][0])
        return {
            'energy': float(out[K.PRED_TOTAL_ENERGY][0]),
            'energies': np.asarray(out[K.ATOMIC_ENERGY][:n]),
            'forces': np.asarray(out[K.PRED_FORCE][:n]),
            'stress': stress,
            'stress_kbar': stress * STRESS_COEFF_KBAR,
        }

    # ASE-like conveniences
    def get_potential_energy(self, s: Structure) -> float:
        return self.calculate(s)['energy']

    def get_forces(self, s: Structure) -> np.ndarray:
        return self.calculate(s)['forces']

    def get_stress(self, s: Structure) -> np.ndarray:
        return self.calculate(s)['stress']
