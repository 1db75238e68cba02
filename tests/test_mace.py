"""MACE interaction type: symmetric contraction + block integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.vasp import Structure
from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.model.build import build_model_spec
from sevennet_finetuning_tpu.model.graph import collate, structure_to_graph
from sevennet_finetuning_tpu.model.nequip import apply_model, init_params
from sevennet_finetuning_tpu.ops.symmetric_contraction import (
    apply_sym_contraction,
    init_sym_contraction,
    sym_contraction_spec,
    u_matrix,
)
from tests.helpers import rep_matrix


def test_u_matrix_scalar_paths():
    coupling = Irreps('1x0e+1x1e+1x2e')
    U = u_matrix(coupling, coupling[0].ir, 2)   # nu=2 -> scalars
    # 0e from 0ex0e, 1ex1e, 2ex2e -> 3 paths
    assert U.shape == (9, 9, 3)


def test_sym_contraction_equivariance():
    irr_in = Irreps('4x0e+4x1e+4x2e')
    irr_out = Irreps('4x0e+4x1e+4x2e')
    spec = sym_contraction_spec(irr_in, irr_out, 3, num_elements=2)
    rng = np.random.default_rng(0)
    w = init_sym_contraction(spec, rng)
    x = rng.normal(size=(6, irr_in.dim))
    attr = np.eye(2)[rng.integers(0, 2, 6)]
    out = np.asarray(
        apply_sym_contraction(spec, w, jnp.asarray(x), jnp.asarray(attr))
    )
    R = Rotation.random(random_state=1).as_matrix()
    Din = rep_matrix(irr_in, R)
    Dout = rep_matrix(irr_out, R)
    out_rot = np.asarray(
        apply_sym_contraction(spec, w, jnp.asarray(x @ Din.T),
                              jnp.asarray(attr))
    )
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-4)


def test_sym_contraction_cubic_in_x():
    # with only the nu=3 weights nonzero the output is cubic in x
    irr = Irreps('2x0e+2x1e')
    spec = sym_contraction_spec(irr, Irreps('2x0e'), 3, num_elements=1)
    rng = np.random.default_rng(1)
    w = init_sym_contraction(spec, rng)
    w = {k: (v if k.endswith('nu3') else np.zeros_like(v))
         for k, v in w.items()}
    x = rng.normal(size=(3, irr.dim))
    attr = np.ones((3, 1))
    o1 = np.asarray(apply_sym_contraction(spec, w, jnp.asarray(x),
                                          jnp.asarray(attr)))
    o2 = np.asarray(apply_sym_contraction(spec, w, jnp.asarray(2.0 * x),
                                          jnp.asarray(attr)))
    np.testing.assert_allclose(o2, 8.0 * o1, rtol=1e-5)


@pytest.fixture(scope='module')
def mace_setup():
    rng = np.random.default_rng(0)
    n = 24
    s = Structure(
        species=['Si' if i % 2 else 'O' for i in range(n)],
        pos=rng.uniform(0, 9.0, (n, 3)),
        cell=np.eye(3) * 9.0,
    )
    tm = {8: 0, 14: 1}
    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 2,
        K.NUM_CONVOLUTION: 2, K.CUTOFF: 3.5, K.IS_PARITY: False,
        K.INTERACTION_TYPE: 'mace', K.CORRELATION: 3,
        K.CONV_DENOMINATOR: 10.0, K.SHIFT: -2.0, K.SCALE: 1.0,
    }
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    g = structure_to_graph(s, 3.5, tm)
    b = collate([g], n_node=n, n_edge=g[K.EDGE_IDX].shape[1], n_graph=1)
    b = {k: jnp.asarray(v) for k, v in b.items()
         if k not in (K.INFO, K.USER_LABEL)}
    return s, spec, params, b


def test_mace_model_forward_and_equivariance(mace_setup):
    s, spec, params, b = mace_setup
    assert spec.blocks[0].block_type == 'mace'
    out = apply_model(spec, params, b)
    E = float(out[K.PRED_TOTAL_ENERGY][0])
    F = np.asarray(out[K.PRED_FORCE])
    assert np.isfinite(E) and np.isfinite(F).all()

    R = Rotation.random(random_state=4).as_matrix()
    b2 = dict(b)
    b2[K.POS] = b[K.POS] @ jnp.asarray(R.T, dtype=b[K.POS].dtype)
    b2[K.CELL] = b[K.CELL] @ jnp.asarray(R.T, dtype=b[K.CELL].dtype)
    out2 = apply_model(spec, params, b2)
    np.testing.assert_allclose(
        float(out2[K.PRED_TOTAL_ENERGY][0]), E, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out2[K.PRED_FORCE]), F @ R.T, atol=1e-4
    )


def test_mace_forces_finite_difference(mace_setup):
    s, spec, params, b = mace_setup
    b64 = {k: (v.astype(jnp.float64) if v.dtype == jnp.float32 else v)
           for k, v in b.items()}
    fwd = jax.jit(lambda bb: apply_model(spec, params, bb))
    out = fwd(b64)
    eps = 1e-5
    for (a, ax) in [(2, 0), (11, 2)]:
        pp = np.asarray(b64[K.POS]).copy()
        pm = pp.copy()
        pp[a, ax] += eps
        pm[a, ax] -= eps
        fd = -(fwd({**b64, K.POS: jnp.asarray(pp)})[K.PRED_TOTAL_ENERGY][0]
               - fwd({**b64, K.POS: jnp.asarray(pm)})[K.PRED_TOTAL_ENERGY][0]
               ) / (2 * eps)
        np.testing.assert_allclose(
            float(fd), float(out[K.PRED_FORCE][a, ax]), atol=1e-6
        )


def test_mace_trains(mace_setup):
    from sevennet_finetuning_tpu.data.dataset import GraphDataset, Loader
    from sevennet_finetuning_tpu.train.trainer import Trainer

    s, spec, params, _ = mace_setup
    rng = np.random.default_rng(5)
    structs = []
    for i in range(4):
        s2 = Structure(
            species=list(s.species),
            pos=s.pos + rng.normal(scale=0.05, size=s.pos.shape),
            cell=s.cell,
            energy=-100.0 + rng.normal(),
            forces=rng.normal(size=s.pos.shape),
            stress=rng.normal(size=6) * 0.01,
        )
        structs.append(s2)
    tm = dict(spec.type_map)
    ds = GraphDataset.from_structures(structs, spec.cutoff, tm)
    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 2,
        K.NUM_CONVOLUTION: 2, K.CUTOFF: 3.5, K.IS_PARITY: False,
        K.INTERACTION_TYPE: 'mace', K.CORRELATION: 3,
        K.CONV_DENOMINATOR: 10.0, K.SHIFT: -100.0 / 24, K.SCALE: 1.0,
        K.IS_TRAIN_STRESS: True, K.OPTIMIZER: 'adam',
        K.OPTIM_PARAM: {'lr': 0.01},
    }
    trainer = Trainer(spec, params, cfg)
    loader = Loader(ds, batch_size=2)
    m1 = trainer.run_one_epoch(loader, is_train=True)
    for _ in range(4):
        m2 = trainer.run_one_epoch(loader, is_train=True)
    assert m2['TotalLoss_None'] < m1['TotalLoss_None']


def test_mace_halo_parallel(mace_setup):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sevennet_finetuning_tpu.parallel.halo import (
        SP_AXIS,
        build_halo_plan,
        gather_forces,
        make_halo_forward,
        scatter_positions,
    )

    s, spec, params, b = mace_setup
    out = apply_model(spec, params, b)
    e_ser = float(out[K.PRED_TOTAL_ENERGY][0])
    f_ser = np.asarray(out[K.PRED_FORCE][:len(s)])

    plan = build_halo_plan(s, spec.cutoff, dict(spec.type_map), 2)
    mesh = Mesh(np.array(jax.devices()[:2]), (SP_AXIS,))
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = make_halo_forward(spec, pj, plan, mesh)
    pos = jax.device_put(
        jnp.asarray(scatter_positions(plan, s.pos.astype(np.float32))),
        NamedSharding(mesh, P(SP_AXIS)),
    )
    e, f, _ = fwd(pos)
    assert abs(float(e) - e_ser) < 1e-3 * max(1, abs(e_ser))
    np.testing.assert_allclose(gather_forces(plan, f), f_ser, atol=1e-4)
