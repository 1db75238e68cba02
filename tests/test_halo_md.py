"""Spatial-decomposition (halo exchange) and MD driver tests.

The distributed correctness contract mirrors the reference's
"serial and parallel models give the same results" check (reference:
pretrained_potentials/SevenNet_0__11July2024/README.md:29-30), here on a
virtual CPU device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.vasp import Structure, replicate
from sevennet_finetuning_tpu.model.build import build_model_spec
from sevennet_finetuning_tpu.model.graph import collate, structure_to_graph
from sevennet_finetuning_tpu.model.nequip import apply_model, init_params
from sevennet_finetuning_tpu.parallel.halo import (
    SP_AXIS,
    build_halo_plan,
    gather_forces,
    make_halo_forward,
    scatter_positions,
)


def _structure(n=60, seed=0, a=12.0):
    rng = np.random.default_rng(seed)
    return Structure(
        species=['Si' if i % 2 else 'O' for i in range(n)],
        pos=rng.uniform(0, a, (n, 3)),
        cell=np.eye(3) * a,
    )


def _model(tm, cutoff=3.5):
    cfg = {
        K.NUM_SPECIES: len(tm), K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 1,
        K.NUM_CONVOLUTION: 3, K.CUTOFF: cutoff, K.IS_PARITY: True,
        K.CONV_DENOMINATOR: 15.0, K.SHIFT: -3.0, K.SCALE: 1.2,
    }
    spec = build_model_spec(cfg)
    return spec, init_params(spec, 0)


def _serial_reference(spec, params, s):
    g = structure_to_graph(s, spec.cutoff, dict(spec.type_map))
    b = collate([g], n_node=len(s), n_edge=g[K.EDGE_IDX].shape[1],
                n_graph=1)
    b = {k: jnp.asarray(v) for k, v in b.items()
         if k not in (K.INFO, K.USER_LABEL)}
    out = apply_model(spec, jax.tree_util.tree_map(jnp.asarray, params), b)
    return (
        float(out[K.PRED_TOTAL_ENERGY][0]),
        np.asarray(out[K.PRED_FORCE][:len(s)]),
        np.asarray(out[K.PRED_STRESS][0]),
    )


@pytest.mark.parametrize('n_dev', [1, 2, 4])
def test_halo_matches_serial(n_dev):
    s = _structure()
    if n_dev == 4:  # keep slab width > cutoff
        s = replicate(s, 2, 1, 1)
    tm = {8: 0, 14: 1}
    spec, params = _model(tm)
    e_ser, f_ser, s_ser = _serial_reference(spec, params, s)

    plan = build_halo_plan(s, spec.cutoff, tm, n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (SP_AXIS,))
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = make_halo_forward(spec, pj, plan, mesh)
    pos = jax.device_put(
        jnp.asarray(scatter_positions(plan, s.pos.astype(np.float32))),
        NamedSharding(mesh, P(SP_AXIS)),
    )
    e, f, st = fwd(pos)
    assert abs(float(e) - e_ser) < 1e-3 * max(1, abs(e_ser))
    np.testing.assert_allclose(gather_forces(plan, f), f_ser, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), s_ser, atol=1e-6)


def test_halo_rejects_too_small_slabs():
    """A >2-way split axis narrower than the cutoff must abort, like the
    reference (reference: comm_brick.cpp:1071)."""
    s = _structure(a=8.0)
    tm = {8: 0, 14: 1}
    with pytest.raises(ValueError):
        build_halo_plan(s, 3.5, tm, 8, dims=(8, 1, 1))
    with pytest.raises(ValueError):
        build_halo_plan(s, 3.5, tm, 16)  # no feasible factorization


def test_brick_8dev_hfo2_matches_serial():
    """VERDICT item 5 done-criterion: serial == parallel at 8 devices
    ((2,2,2) brick) on the 96-atom HfO2 cell replicated 2x2x2 -- the
    reference's md_parallel_example workload."""
    from sevennet_finetuning_tpu.data.vasp import read_outcar
    from sevennet_finetuning_tpu.parallel.halo import choose_dims

    base = read_outcar(
        '/root/reference/example_inputs/data/label_1/OUTCAR_1'
    )[0]
    s = replicate(base, 2, 2, 2)   # 768 atoms
    tm = {8: 0, 72: 1}
    spec, params = _model(tm, cutoff=4.0)
    assert choose_dims(s.cell, 4.0, 8) == (2, 2, 2)

    e_ser, f_ser, s_ser = _serial_reference(spec, params, s)
    plan = build_halo_plan(s, spec.cutoff, tm, 8)
    assert plan.dims == (2, 2, 2)
    assert len(plan.stages) == 3
    mesh = Mesh(np.array(jax.devices()[:8]), (SP_AXIS,))
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = make_halo_forward(spec, pj, plan, mesh)
    pos = jax.device_put(
        jnp.asarray(scatter_positions(plan, s.pos.astype(np.float32))),
        NamedSharding(mesh, P(SP_AXIS)),
    )
    e, f, st = fwd(pos)
    assert abs(float(e) - e_ser) < 1e-3 * max(1, abs(e_ser))
    np.testing.assert_allclose(gather_forces(plan, f), f_ser, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st), s_ser, atol=1e-6)


@pytest.mark.parametrize('dims', [(2, 2, 1), (1, 2, 2), (2, 1, 2)])
def test_brick_2d_matches_serial(dims):
    """2-D brick grids (4 devices) against the serial oracle."""
    s = replicate(_structure(n=40, seed=2, a=9.0), 2, 2, 2)
    tm = {8: 0, 14: 1}
    spec, params = _model(tm, cutoff=3.0)
    e_ser, f_ser, s_ser = _serial_reference(spec, params, s)

    plan = build_halo_plan(s, spec.cutoff, tm, 4, dims=dims)
    mesh = Mesh(np.array(jax.devices()[:4]), (SP_AXIS,))
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = make_halo_forward(spec, pj, plan, mesh)
    pos = jax.device_put(
        jnp.asarray(scatter_positions(plan, s.pos.astype(np.float32))),
        NamedSharding(mesh, P(SP_AXIS)),
    )
    e, f, st = fwd(pos)
    assert abs(float(e) - e_ser) < 1e-3 * max(1, abs(e_ser))
    np.testing.assert_allclose(gather_forces(plan, f), f_ser, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), s_ser, atol=1e-6)


def test_md_energy_conservation():
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.md import VelocityVerlet

    s = _structure(n=30)
    tm = {8: 0, 14: 1}
    spec, params = _model(tm)
    calc = Calculator(spec, params)
    md = VelocityVerlet(s, calc, dt_fs=0.5)
    md.set_temperature(100.0, seed=3)
    res = md.run(10)
    tot = res.total
    scale = max(1.0, abs(tot[0]))
    assert abs(tot[-1] - tot[0]) / scale < 1e-3


def test_md_serial_vs_halo_parallel():
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.md import VelocityVerlet

    s = replicate(_structure(n=24, a=8.0), 2, 1, 1)
    tm = {8: 0, 14: 1}
    spec, params = _model(tm, cutoff=3.0)
    calc = Calculator(spec, params)

    md1 = VelocityVerlet(s, calc, dt_fs=0.5)
    md1.set_temperature(50.0, seed=5)
    v0 = md1.vel.copy()
    r1 = md1.run(3)

    mesh = Mesh(np.array(jax.devices()[:2]), (SP_AXIS,))
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    md2 = VelocityVerlet(
        s, None, dt_fs=0.5,
        halo=dict(spec=spec, params=pj, n_dev=2, mesh=mesh),
    )
    md2.vel = v0.copy()
    r2 = md2.run(3)
    np.testing.assert_allclose(md1.s.pos, md2.s.pos, atol=1e-5)
    for a, b in zip(r1.energies, r2.energies):
        assert abs(a - b) < 1e-3 * max(1.0, abs(a))


def test_calculator_roundtrip(tmp_path):
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.train.checkpoint import save_checkpoint

    s = _structure(n=20)
    tm = {8: 0, 14: 1}
    spec, params = _model(tm)
    calc = Calculator(spec, params)
    out = calc.calculate(s)
    assert np.isfinite(out['energy'])
    assert out['forces'].shape == (20, 3)
    assert out['stress'].shape == (6,)
    # zero net force (translation invariance)
    np.testing.assert_allclose(out['forces'].sum(0), 0.0, atol=1e-4)


def test_md_langevin_thermostat_controls_temperature():
    """BAOAB Langevin NVT drives the kinetic temperature to the target
    from a cold start (NVE would stay near 0 K for a near-equilibrium
    structure)."""
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.md import VelocityVerlet

    s = _structure(n=24, seed=3, a=9.0)
    spec, params = _model({8: 0, 14: 1})
    calc = Calculator(spec, params)

    md = VelocityVerlet(s, calc, dt_fs=2.0)
    T_target = 600.0
    md.run(60, thermostat=dict(kind='langevin', T=T_target,
                               gamma_per_fs=0.5), seed=1)
    # strong coupling, small system: settle within a broad band of target
    T_late = np.mean(md.result.temperatures[-20:])
    assert 0.4 * T_target < T_late < 1.8 * T_target, T_late

    # NVE control from the same cold start stays cold
    md2 = VelocityVerlet(s, calc, dt_fs=2.0)
    md2.run(20)
    assert np.mean(md2.result.temperatures[-5:]) < 0.2 * T_target


def test_halo_plan_overlap_partition():
    """The comm/compute-overlap partition (edge_loc/edge_gh) is exact:
    local-source + ghost-source edges reproduce the combined per-device
    edge list, each dst-sorted with valid src-sort permutations."""
    s = _structure()
    tm = {8: 0, 14: 1}
    spec, _ = _model(tm)
    plan = build_halo_plan(s, spec.cutoff, tm, 2)
    for d in range(plan.n_dev):
        combined = set()
        n_comb = int(plan.edge_mask[d].sum())
        for k in range(n_comb):
            combined.add((int(plan.edge_idx[d, 0, k]),
                          int(plan.edge_idx[d, 1, k]),
                          tuple(plan.edge_shift[d, k].tolist())))
        split = set()
        for part, sentinel in ((plan.edge_loc, plan.n_local),
                               (plan.edge_gh, plan.buffer_rows)):
            n_p = int(part['mask'][d].sum())
            dsts = part['idx'][d, 0, :n_p]
            assert np.all(np.diff(dsts) >= 0), 'dst must stay sorted'
            assert np.all(part['idx'][d, 0, n_p:] == plan.n_local)
            assert np.all(part['idx'][d, 1, n_p:] == sentinel)
            srcs_sorted = part['idx'][d, 1][part['perm'][d]]
            assert np.all(np.diff(srcs_sorted) >= 0), 'src perm invalid'
            for k in range(n_p):
                split.add((int(part['idx'][d, 0, k]),
                           int(part['idx'][d, 1, k]),
                           tuple(part['shift'][d, k].tolist())))
        # sources: loc strictly local, gh strictly ghost
        n_l = int(plan.edge_loc['mask'][d].sum())
        assert np.all(plan.edge_loc['idx'][d, 1, :n_l] < plan.n_local)
        n_g = int(plan.edge_gh['mask'][d].sum())
        assert np.all(plan.edge_gh['idx'][d, 1, :n_g] >= plan.n_local)
        assert split == combined
