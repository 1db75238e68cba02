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
    def __init__(self, spec: ModelSpec, params: Params,
                 d3: Optional[Dict] = None):
        """d3: optional dispersion settings, e.g.
        dict(functional='pbe', damping='bj'[, cutoff=..., cn_cutoff=...])
        -- adds Grimme D3 energy/forces/stress on top of the GNN
        (the reference couples its CUDA D3 pair style the same way,
        reference: sevenn/pair_e3gnn/README.md)."""
        import jax
        import jax.numpy as jnp

        self.spec = spec
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.type_map = dict(spec.type_map)
        self._fwd_cache: Dict[Tuple[int, int], object] = {}
        self.d3 = None
        if d3 is not None:
            from .ops.d3 import AU_TO_ANG, d3_spec, d3_static_arrays

            zs = [z for z, _ in sorted(self.type_map.items(),
                                       key=lambda kv: kv[1])]
            self.d3 = {
                'spec': d3_spec(zs, **d3),
                'cutoff_ang': None,
            }
            self.d3['arrays'] = d3_static_arrays(self.d3['spec'])
            self.d3['cutoff_ang'] = self.d3['spec'].cutoff * AU_TO_ANG

    @classmethod
    def from_checkpoint(cls, path: str) -> 'Calculator':
        """Accepts our pickle checkpoints, reference torch .pth files,
        and the pickle-free npz deploy artifacts alike."""
        from . import keys as K
        from .train.checkpoint import model_from_checkpoint

        spec, params, config = model_from_checkpoint(path)
        # dispersion travels with the checkpoint config (model section
        # key 'dispersion') so deployed potentials keep their D3 terms
        return cls(spec, params, d3=(config or {}).get(K.DISPERSION))

    @classmethod
    def from_deployed(cls, path: str) -> 'Calculator':
        """Load an npz+json deploy artifact (safe: no pickle)."""
        from .train.checkpoint import model_from_deployed

        spec, params, _ = model_from_deployed(path)
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
            spec = self.spec
            # params enter as an ARGUMENT: closing them over would bake
            # 843k weights into the program as constants, which some
            # runtimes re-stage on every call (~100x slower dispatch)
            self._fwd_cache[key] = jax.jit(
                lambda p, b: apply_model(spec, p, b)
            )
        fn = self._fwd_cache[key]
        return lambda b: fn(self.params, b)

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
        energy = float(out[K.PRED_TOTAL_ENERGY][0])
        forces = np.asarray(out[K.PRED_FORCE][:n])
        stress = np.asarray(out[K.PRED_STRESS][0])

        if self.d3 is not None:
            e_d3, f_d3, s_d3 = self._d3_terms(s)
            energy += e_d3
            forces = forces + f_d3
            stress = stress + s_d3

        return {
            'energy': energy,
            'energies': np.asarray(out[K.ATOMIC_ENERGY][:n]),
            'forces': forces,
            'stress': stress,
            'stress_kbar': stress * STRESS_COEFF_KBAR,
        }

    def d3_terms(self, s: Structure):
        """(energy eV, forces, stress Voigt) of the D3 term alone."""
        return self._d3_terms(s)

    def _d3_terms(self, s: Structure):
        import jax.numpy as jnp

        from .data.neighborlist import neighbor_list
        from .ops.d3 import d3_energy_forces_stress

        i, j, shift, _ = neighbor_list(
            s.pos, s.cell, s.pbc, self.d3['cutoff_ang']
        )
        types = np.array(
            [self.type_map[int(z)] for z in s.atomic_numbers], np.int32
        )
        e, f, st = d3_energy_forces_stress(
            self.d3['spec'], self.d3['arrays'],
            jnp.asarray(s.pos, jnp.float32), jnp.asarray(types),
            jnp.asarray(np.stack([i, j]).astype(np.int32)),
            jnp.asarray(shift, jnp.float32),
            jnp.asarray(s.cell, jnp.float32),
            jnp.ones(len(i), jnp.float32),
            float(s.volume),
        )
        return float(e), np.asarray(f), np.asarray(st)

    # ASE-like conveniences
    def get_potential_energy(self, s: Structure) -> float:
        return self.calculate(s)['energy']

    def get_forces(self, s: Structure) -> np.ndarray:
        return self.calculate(s)['forces']

    def get_stress(self, s: Structure) -> np.ndarray:
        return self.calculate(s)['stress']


class SevenNetASECalculator:
    """ase.calculators adapter over :class:`Calculator` (the reference's
    SevenNetCalculator surface, reference: sevenn/sevennet_calculator.py:
    17-157).  Imported lazily: only usable where ase is installed."""

    implemented_properties = ('energy', 'energies', 'forces', 'stress',
                              'free_energy')

    def __init__(self, model, **kwargs):
        from ase.calculators.calculator import Calculator as AseBase

        if isinstance(model, str):
            model = Calculator.from_checkpoint(model)
        self._inner = model

        outer = self

        class _Impl(AseBase):
            implemented_properties = list(
                SevenNetASECalculator.implemented_properties
            )

            def calculate(self, atoms=None, properties=('energy',),
                          system_changes=None):
                super().calculate(atoms, properties, system_changes)
                s = Structure(
                    species=list(atoms.get_chemical_symbols()),
                    pos=np.asarray(atoms.get_positions(), float),
                    cell=np.asarray(atoms.get_cell()[:], float),
                    pbc=tuple(bool(p) for p in atoms.get_pbc()),
                )
                res = outer._inner.calculate(s)
                self.results = {
                    'energy': float(res['energy']),
                    'free_energy': float(res['energy']),
                    'energies': np.asarray(res['energies']),
                    'forces': np.asarray(res['forces']),
                    # ase Voigt order xx yy zz yz xz xy, sign flipped
                    'stress': -np.asarray(res['stress'])[
                        [0, 1, 2, 4, 5, 3]
                    ],
                }

        self.ase_calculator = _Impl(**kwargs)

    def __getattr__(self, name):
        return getattr(self.ase_calculator, name)
