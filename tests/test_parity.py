"""Parity vs the reference's deployed TorchScript potentials.

The reference ships frozen serial/parallel TorchScript models; weights are
imported into our ModelSpec and energies/forces/stress must agree at fp32
precision.  Parallel segment files provide per-layer oracles.
Skipped when the reference tree is unavailable.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')
# single-threaded oracle: torch CPU parallel index_add/scatter reductions
# are nondeterministic in summation order, which flakes fp32 force asserts
torch.set_num_threads(1)

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.compat.known_models import (
    EXAMPLE_MD_MODEL,
    SEVENNET_0_11JULY2024,
)
from sevennet_finetuning_tpu.compat.torchscript_import import (
    import_deployed_serial,
)
from sevennet_finetuning_tpu.data.vasp import read_outcar
from sevennet_finetuning_tpu.model.graph import collate, structure_to_graph
from sevennet_finetuning_tpu.model.nequip import (
    apply_model,
    compute_edge_vec,
    energy_network,
)

REF = '/root/reference'
SMALL = f'{REF}/example_inputs/md_serial_example/deployed_serial.pt'
SEVENNET0 = (f'{REF}/sevenn/pretrained_potentials/SevenNet_0__11July2024/'
             'serial_model/deployed_serial.pt')
OUTCAR = f'{REF}/example_inputs/data/label_1/OUTCAR_1'

pytestmark = pytest.mark.skipif(
    not os.path.exists(SMALL), reason='reference artifacts not present'
)


def _run_both(path, overrides):
    import jax
    import jax.numpy as jnp

    spec, params, meta, config = import_deployed_serial(path, overrides)
    s = read_outcar(OUTCAR)[0]
    g = structure_to_graph(s, float(meta['cutoff']), config[K.TYPE_MAP])

    m = torch.jit.load(path, map_location='cpu')
    pos_t = torch.tensor(g[K.POS], dtype=torch.float32, requires_grad=True)
    inp = {
        'x': torch.tensor(g[K.ATOM_TYPE], dtype=torch.long),
        'pos': pos_t,
        'edge_index': torch.tensor(g[K.EDGE_IDX], dtype=torch.long),
        'num_atoms': torch.tensor([len(s)], dtype=torch.long),
        'cell_lattice_vectors': torch.tensor(g[K.CELL][0],
                                             dtype=torch.float32),
        'cell_volume': torch.tensor(g[K.CELL_VOLUME][0]),
        'pbc_shift': torch.tensor(g[K.CELL_SHIFT], dtype=torch.float32),
    }
    out_ts = m(inp)

    b = collate([g], n_node=len(s), n_edge=g[K.EDGE_IDX].shape[1], n_graph=1)
    b = {k: jnp.asarray(v) for k, v in b.items()
         if k not in (K.INFO, K.USER_LABEL)}
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    out = apply_model(spec, pj, b)
    return out_ts, out, (spec, pj, b, g, config)


def test_small_model_parity():
    out_ts, out, info = _run_both(SMALL, EXAMPLE_MD_MODEL)
    n_atoms = len(info[3][K.POS])
    e_ts = float(out_ts['inferred_total_energy'].detach())
    e = float(out[K.PRED_TOTAL_ENERGY][0])
    # compare per-atom: the total is O(100) eV, so an absolute tolerance
    # there sits at fp32 epsilon and flakes with summation order.
    # typical deviation is ~0; tolerance leaves ~20x headroom for torch
    # thread-count-dependent reduction order
    de = abs(e - e_ts) / n_atoms
    assert de < 1e-4, f'per-atom energy mismatch {de:.3e} (e={e}, ts={e_ts})'
    f_ts = out_ts['inferred_force'].detach().numpy()
    np.testing.assert_allclose(
        np.asarray(out[K.PRED_FORCE]), f_ts, atol=2e-4
    )
    s_ts = out_ts['inferred_stress'].detach().numpy().ravel()[:6]
    np.testing.assert_allclose(
        np.asarray(out[K.PRED_STRESS][0]), s_ts, atol=2e-6
    )


def test_sevennet0_parity():
    if not os.path.exists(SEVENNET0):
        pytest.skip('SevenNet-0 artifact not present')
    out_ts, out, info = _run_both(SEVENNET0, SEVENNET_0_11JULY2024)
    n_atoms = len(info[3][K.POS])
    e_ts = float(out_ts['inferred_total_energy'].detach())
    e = float(out[K.PRED_TOTAL_ENERGY][0])
    de = abs(e - e_ts) / n_atoms
    assert de < 1e-4, f'per-atom energy mismatch {de:.3e} (e={e}, ts={e_ts})'
    f_ts = out_ts['inferred_force'].detach().numpy()
    np.testing.assert_allclose(
        np.asarray(out[K.PRED_FORCE]), f_ts, atol=1e-4
    )
    s_ts = out_ts['inferred_stress'].detach().numpy().ravel()[:6]
    np.testing.assert_allclose(
        np.asarray(out[K.PRED_STRESS][0]), s_ts, atol=1e-6
    )


def test_per_layer_parity_vs_parallel_segments():
    """Chained parallel segments expose per-layer activations; every
    captured stage must match allclose (BASELINE parity requirement)."""
    import jax
    import jax.numpy as jnp

    seg_dir = f'{REF}/example_inputs/md_parallel_example/deployed_parallel'
    if not os.path.exists(f'{seg_dir}/deployed_parallel_0.pt'):
        pytest.skip('parallel segments not present')
    spec, params, meta, config = import_deployed_serial(
        SMALL, EXAMPLE_MD_MODEL
    )
    s = read_outcar(OUTCAR)[0]
    g = structure_to_graph(s, float(meta['cutoff']), config[K.TYPE_MAP])
    b = collate([g], n_node=len(s), n_edge=g[K.EDGE_IDX].shape[1], n_graph=1)
    bj = {k: jnp.asarray(v) for k, v in b.items()
          if k not in (K.INFO, K.USER_LABEL)}
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    inter = {}
    energy_network(spec, pj, bj, compute_edge_vec(bj), intermediates=inter)

    segs = [
        torch.jit.load(f'{seg_dir}/deployed_parallel_{i}.pt',
                       map_location='cpu')
        for i in range(4)
    ]
    ev = np.asarray(compute_edge_vec(bj))
    data = {
        'x': torch.tensor(g[K.ATOM_TYPE], dtype=torch.long),
        'x_ghost': torch.zeros(0, dtype=torch.long),
        'edge_vec': torch.tensor(ev, dtype=torch.float32),
        'edge_index': torch.tensor(g[K.EDGE_IDX], dtype=torch.long),
        'num_atoms': torch.tensor([len(s)], dtype=torch.long),
        'nlocal': torch.tensor([len(s)]),
    }
    for i in range(3):
        data = dict(segs[i](data))
        np.testing.assert_allclose(
            data['x'].detach().numpy(),
            np.asarray(inter[f'{i + 1}_self_interaction_1']),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            data['self_cont_tmp'].detach().numpy(),
            np.asarray(inter[f'{i + 1}_self_connection_intro']),
            atol=1e-4,
        )
        data['x_ghost'] = torch.zeros((0, data['x'].shape[1]))
    data = dict(segs[3](data))
    np.testing.assert_allclose(
        data['scaled_atomic_energy'].detach().numpy().ravel(),
        np.asarray(
            energy_network(spec, pj, bj, compute_edge_vec(bj))[
                K.SCALED_ATOMIC_ENERGY
            ]
        ).ravel(),
        atol=1e-5,
    )
