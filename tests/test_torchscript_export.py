"""TorchScript export round-trip: a TPU-trained model must load with
plain torch and reproduce our energies/forces/stress through the
reference's serial deploy interface (reference:
sevenn/scripts/deploy.py:15-51, consumed at
sevenn/pair_e3gnn/pair_e3gnn.cpp:205-266).

Drives the exported artifact with exactly the input dict the C++ pair
style builds and compares against the JAX forward on the reference's
example data (OUTCAR_1).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.compat.known_models import (
    pretrained_name_to_path,
)
from sevennet_finetuning_tpu.compat.state_dict_import import (
    import_reference_checkpoint,
)
from sevennet_finetuning_tpu.compat.torchscript_export import export_serial
from sevennet_finetuning_tpu.data.vasp import read_outcar
from sevennet_finetuning_tpu.model.graph import collate, structure_to_graph
from sevennet_finetuning_tpu.model.nequip import apply_model

OUTCAR = '/root/reference/example_inputs/data/label_1/OUTCAR_1'


@pytest.fixture(scope='module')
def sevennet0():
    spec, params, _, _ = import_reference_checkpoint(
        pretrained_name_to_path('SevenNet-0'))
    return spec, params


def _jax_reference(spec, params, s):
    tm = dict(spec.type_map)
    g = structure_to_graph(s, spec.cutoff, tm)
    b = collate([g], n_node=len(s), n_edge=g[K.EDGE_IDX].shape[1],
                n_graph=1)
    b = {k: jnp.asarray(v) for k, v in b.items()
         if k not in (K.INFO, K.USER_LABEL)}
    out = apply_model(spec, jax.tree_util.tree_map(jnp.asarray, params), b)
    return (
        float(out[K.PRED_TOTAL_ENERGY][0]),
        np.asarray(out[K.PRED_FORCE][:len(s)]),
        np.asarray(out[K.PRED_STRESS][0]),
        g,
    )


def _cpp_style_inputs(spec, s, g):
    """The dict pair_e3gnn.cpp:205-215 would build for this cell."""
    tm = dict(spec.type_map)
    types = torch.tensor(
        [tm[z] for z in s.atomic_numbers], dtype=torch.long)
    pos = torch.tensor(np.asarray(s.pos), dtype=torch.float32)
    pos.requires_grad_(True)
    return {
        'x': types,
        'pos': pos,
        'edge_index': torch.tensor(
            np.asarray(g[K.EDGE_IDX]), dtype=torch.long),
        'pbc_shift': torch.tensor(
            np.asarray(g[K.CELL_SHIFT]), dtype=torch.float32),
        'cell_lattice_vectors': torch.tensor(
            np.asarray(s.cell), dtype=torch.float32),
        'cell_volume': torch.tensor(float(s.volume)),
        'num_atoms': torch.tensor(len(s)),
    }


def test_export_roundtrip_sevennet0(sevennet0, tmp_path):
    spec, params = sevennet0
    s = read_outcar(OUTCAR)[0]
    e_ref, f_ref, st_ref, g = _jax_reference(spec, params, s)

    path = export_serial(spec, params, str(tmp_path / 'deployed_serial'))
    meta = {
        'chemical_symbols_to_index': '', 'cutoff': '', 'num_species': '',
        'model_type': '', 'version': '', 'dtype': '', 'time': '',
    }
    model = torch.jit.load(path, _extra_files=meta)
    meta = {k: v.decode() if isinstance(v, bytes) else v
            for k, v in meta.items()}

    assert meta['model_type'] == 'E3_equivariant_model'
    assert abs(float(meta['cutoff']) - spec.cutoff) < 1e-9
    assert int(meta['num_species']) == spec.num_species
    syms = meta['chemical_symbols_to_index'].split()
    assert len(syms) == spec.num_species

    out = model(_cpp_style_inputs(spec, s, g))
    e = float(out['inferred_total_energy'])
    f = out['inferred_force'].detach().numpy()
    st = out['inferred_stress'].detach().numpy()
    ae = out['atomic_energy'].detach().numpy()

    n = len(s)
    assert abs(e - e_ref) / n < 1e-4, (e, e_ref)
    np.testing.assert_allclose(f, f_ref, atol=2e-4)
    # stress voigt order xx yy zz xy yz zx(==xz)
    np.testing.assert_allclose(st, st_ref, atol=2e-5)
    assert abs(float(ae.sum()) - e) < 1e-3


def test_export_roundtrip_trained_small(tmp_path):
    """A freshly initialized small model (species-wise rescale, lmax 1)
    survives the round trip too -- the exporter is not SevenNet-0
    specific."""
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.nequip import init_params

    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: {8: 0, 72: 1},
        K.NODE_FEATURE_MULTIPLICITY: 8, K.LMAX: 1,
        K.NUM_CONVOLUTION: 2, K.CUTOFF: 4.5, K.IS_PARITY: True,
        K.CONV_DENOMINATOR: 20.0,
        K.SHIFT: [-3.0, -2.0], K.SCALE: [1.1, 0.9],
    }
    spec = build_model_spec(cfg)
    params = init_params(spec, seed=3)

    s = read_outcar(OUTCAR)[0]
    e_ref, f_ref, st_ref, g = _jax_reference(spec, params, s)

    path = export_serial(spec, params, str(tmp_path / 'small'))
    model = torch.jit.load(path)
    out = model(_cpp_style_inputs(spec, s, g))
    assert abs(float(out['inferred_total_energy']) - e_ref) / len(s) \
        < 1e-4
    np.testing.assert_allclose(
        out['inferred_force'].detach().numpy(), f_ref, atol=2e-4)
    np.testing.assert_allclose(
        out['inferred_stress'].detach().numpy(), st_ref, atol=2e-5)
