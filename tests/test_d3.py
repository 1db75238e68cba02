"""Grimme D3 dispersion: tables, energies, autodiff forces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_finetuning_tpu.ops.d3 import (
    AU_TO_ANG,
    d3_energy,
    d3_energy_forces_stress,
    d3_spec,
    d3_static_arrays,
)


def _pair_edges(n):
    idx = np.array([(a, b) for a in range(n) for b in range(n) if a != b]).T
    return idx.astype(np.int32)


def test_c6_reference_values():
    # known dftd3 values: C6(H,H) = 3.0267, C6(C,C) = 49.113 au at the
    # lowest-CN reference systems
    spec = d3_spec([1, 6])
    arr = d3_static_arrays(spec)
    assert abs(float(arr['c6ref'][0, 0, 0, 0]) - 3.0267) < 1e-3
    assert abs(float(arr['c6ref'][1, 1, 0, 0]) - 49.113) < 1e-2


def test_dimer_energy_negative_and_decaying():
    spec = d3_spec([18], functional='pbe', damping='bj')  # argon
    arr = d3_static_arrays(spec)
    idx = _pair_edges(2)
    em = np.ones(2, np.float32)
    nm = np.ones(2, np.float32)

    def e_at(d):
        pos = np.array([[0, 0, 0], [d, 0, 0]], np.float64)
        return float(d3_energy(
            spec, arr, jnp.asarray(pos), jnp.zeros(2, jnp.int32),
            jnp.asarray(idx), jnp.zeros((2, 3)),
            jnp.eye(3) * 100.0, jnp.asarray(em), jnp.asarray(nm),
        ))

    e4, e6, e10 = e_at(4.0), e_at(6.0), e_at(10.0)
    assert e4 < e6 < e10 < 0
    # asymptotically ~ -C6/r^6
    assert abs(e6 / e10 - (10.0 / 6.0) ** 6) / (10 / 6) ** 6 < 0.35


def test_forces_match_finite_difference_x64():
    spec = d3_spec([6, 1], functional='pbe', damping='bj')
    arr = d3_static_arrays(spec)
    pos = np.array(
        [[0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63],
         [-0.63, 0.63, -0.63], [0.63, -0.63, -0.63]], np.float64
    )
    types = np.array([0, 1, 1, 1, 1], np.int32)
    idx = _pair_edges(5)
    em = np.ones(idx.shape[1], np.float64)
    cell = np.eye(3) * 50.0

    e, f, st = d3_energy_forces_stress(
        spec, arr, jnp.asarray(pos), jnp.asarray(types), jnp.asarray(idx),
        jnp.zeros((idx.shape[1], 3)), jnp.asarray(cell),
        jnp.asarray(em), 50.0 ** 3,
    )
    f = np.asarray(f)
    # net force zero
    np.testing.assert_allclose(f.sum(0), 0.0, atol=1e-10)

    def efn(p):
        return d3_energy(
            spec, arr, p, jnp.asarray(types), jnp.asarray(idx),
            jnp.zeros((idx.shape[1], 3)), jnp.asarray(cell),
            jnp.asarray(em), jnp.ones(5),
        )

    eps = 1e-6
    for (a, ax) in [(1, 0), (0, 2)]:
        pp = pos.copy()
        pm = pos.copy()
        pp[a, ax] += eps
        pm[a, ax] -= eps
        fd = -(float(efn(jnp.asarray(pp))) - float(efn(jnp.asarray(pm)))
               ) / (2 * eps)
        np.testing.assert_allclose(fd, f[a, ax], atol=1e-8)


def test_pbc_invariance():
    # translating atoms by a lattice vector must not change the energy
    spec = d3_spec([14], functional='pbe', damping='bj', cutoff=15.0,
                   cn_cutoff=10.0)
    arr = d3_static_arrays(spec)
    from sevennet_finetuning_tpu.data.neighborlist import neighbor_list

    rng = np.random.default_rng(0)
    cell = np.eye(3) * 6.0
    pos = rng.uniform(0, 6.0, (8, 3))
    cut_ang = spec.cutoff * AU_TO_ANG

    def energy(p):
        i, j, shift, _ = neighbor_list(p, cell, True, cut_ang)
        return float(d3_energy(
            spec, arr, jnp.asarray(p), jnp.zeros(8, jnp.int32),
            jnp.asarray(np.stack([i, j]).astype(np.int32)),
            jnp.asarray(shift.astype(np.float64)), jnp.asarray(cell),
            jnp.ones(len(i)), jnp.ones(8),
        ))

    e1 = energy(pos)
    p2 = pos.copy()
    p2[3] += cell[0]
    e2 = energy(p2)
    np.testing.assert_allclose(e1, e2, rtol=1e-8)
    assert e1 < 0


def test_calculator_with_d3():
    from sevennet_finetuning_tpu import keys as K
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.data.vasp import Structure
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.nequip import init_params

    tm = {8: 0, 14: 1}
    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 1,
        K.NUM_CONVOLUTION: 2, K.CUTOFF: 3.5, K.IS_PARITY: False,
        K.CONV_DENOMINATOR: 10.0, K.SHIFT: -2.0, K.SCALE: 1.0,
    }
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    rng = np.random.default_rng(1)
    s = Structure(
        species=['Si' if i % 2 else 'O' for i in range(12)],
        pos=rng.uniform(0, 7.0, (12, 3)),
        cell=np.eye(3) * 7.0,
    )
    plain = Calculator(spec, params).calculate(s)
    with_d3 = Calculator(
        spec, params,
        d3=dict(functional='pbe', damping='bj', cutoff=20.0,
                cn_cutoff=10.0),
    ).calculate(s)
    # dispersion lowers the energy and changes forces slightly
    assert with_d3['energy'] < plain['energy']
    assert not np.allclose(with_d3['forces'], plain['forces'])
    np.testing.assert_allclose(with_d3['forces'].sum(0), 0.0, atol=1e-3)
