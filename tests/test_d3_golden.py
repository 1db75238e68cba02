"""D3 dispersion golden tests: physics end-to-end, not just tables.

Round-3 verdict: ``tests/test_d3.py`` pinned two C6 constants and the
r^-6 asymptotics, so a damping-function or coordination-number bug
would have passed.  This file adds:

- an INDEPENDENT NumPy oracle written directly from the published
  equations (Grimme et al., J. Chem. Phys. 132, 154104 (2010) eqs.
  5-16; BJ damping: J. Comput. Chem. 32, 1456 (2011) eqs. 4-6) with its
  own periodic-image enumeration (no shared neighbor-list code), run on
  a REAL 96-atom HfO2 cell from the reference's example data;
- finite-difference force checks of our autodiff against the oracle's
  energy;
- frozen golden numbers so future edits to ops/d3.py cannot silently
  shift the physics;
- product wiring: the 'dispersion' config key reaches
  Calculator.from_checkpoint, and the MD device loop conserves energy
  with D3 on.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.vasp import read_outcar
from sevennet_finetuning_tpu.ops.d3 import (
    AU_TO_ANG,
    BJ_DAMPING_PARAMS,
    HARTREE_TO_EV,
    ZERO_DAMPING_PARAMS,
    _load_tables,
    d3_energy_forces_stress,
    d3_spec,
    d3_static_arrays,
)

OUTCAR = '/root/reference/example_inputs/data/label_1/OUTCAR_1'
# reduced cutoffs keep the O(N * images) oracle affordable; both
# implementations receive the SAME values, so the comparison is exact
CUT = 20.0      # Bohr
CN_CUT = 12.0   # Bohr


def _oracle(pos_ang, cell_ang, zs, functional, damping, pairs=None):
    """Independent NumPy D3: explicit image loops, paper equations.

    ``pairs``: optional frozen (i, j, tvec) inclusion list (built at a
    reference geometry by :func:`_oracle_pairs`).  BJ damping does not
    vanish at the pair cutoff, so the truncated energy is DISCONTINUOUS
    when a pair crosses it; finite differences must hold the inclusion
    set fixed -- the same convention as our fixed-edge-list autodiff.
    """
    t = _load_tables()
    zs = np.asarray(zs)
    pos = np.asarray(pos_ang, float) / AU_TO_ANG
    cell = np.asarray(cell_ang, float) / AU_TO_ANG
    n = len(zs)

    rcov = t['rcov'][zs - 1]
    r2r4 = t['r2r4'][zs - 1]
    # R0AB table is in Angstrom (pair_d3.cu:359 divides at load)
    r0ab = t['r0ab'][np.ix_(zs - 1, zs - 1)] / AU_TO_ANG

    # per-pair C6 reference grids, unpacked with our own reading of the
    # packed layout (column value = z + 100 * (grid_index - 1))
    grids = {}
    for c6, z1p, z2p, cn1, cn2 in t['c6ab']:
        z1p, z2p = int(z1p), int(z2p)
        g1, z1 = (z1p - 1) // 100, (z1p - 1) % 100 + 1
        g2, z2 = (z2p - 1) // 100, (z2p - 1) % 100 + 1
        grids.setdefault((z1, z2), []).append((cn1, cn2, c6))
        if (z1, z2) != (z2, z1):
            grids.setdefault((z2, z1), []).append((cn2, cn1, c6))

    if pairs is None:
        pairs = _oracle_pairs(pos_ang, cell_ang)

    # coordination numbers (2010 eq. 15); inclusion frozen with `pairs`
    cn = np.zeros(n)
    for (i, j, tvec, in_cn, in_cut) in pairs:
        if not in_cn:
            continue
        r = np.linalg.norm(pos[j] + tvec - pos[i])
        cn[i] += 1.0 / (
            1.0 + math.exp(-16.0 * ((rcov[i] + rcov[j]) / r - 1.0))
        )

    def c6_of(i, j):
        """Gaussian-distance interpolation over reference pairs
        (2010 eq. 16, k3 = -4), computed with the min-shift so far-CN
        pairs limit to the closest reference's C6 (the reference CUDA
        branches to the same value, pair_d3.cu:827-884)."""
        refs = grids[(int(zs[i]), int(zs[j]))]
        ds = [(cn[i] - cn1) ** 2 + (cn[j] - cn2) ** 2
              for cn1, cn2, _ in refs]
        dmin = min(ds)
        zsum = wsum = 0.0
        for d, (_, _, c6) in zip(ds, refs):
            w = math.exp(-4.0 * (d - dmin))
            zsum += w * c6
            wsum += w
        return zsum / wsum

    if damping == 'zero':
        rs6, s18, rs18 = ZERO_DAMPING_PARAMS[functional]
        s6 = 1.0
    else:
        rs6, s18, rs18 = BJ_DAMPING_PARAMS[functional]
        s6 = 1.0

    c6_cache = {}
    e = 0.0
    for (i, j, tvec, in_cn, in_cut) in pairs:
        if not in_cut:
            continue
        if (i, j) not in c6_cache:
            c6_cache[(i, j)] = c6_of(i, j)
        c6 = c6_cache[(i, j)]
        c8 = 3.0 * c6 * r2r4[i] * r2r4[j]
        r = np.linalg.norm(pos[j] + tvec - pos[i])
        if damping == 'zero':
            r0 = r0ab[i, j]
            f6 = 1.0 / (1.0 + 6.0 * (rs6 * r0 / r) ** 14)
            f8 = 1.0 / (1.0 + 6.0 * (rs18 * r0 / r) ** 16)
            e += s6 * c6 / r ** 6 * f6 + s18 * c8 / r ** 8 * f8
        else:
            R0 = math.sqrt(c8 / c6)
            dmp = rs6 * R0 + rs18
            e += (s6 * c6 / (r ** 6 + dmp ** 6)
                  + s18 * c8 / (r ** 8 + dmp ** 8))
    return -0.5 * e * HARTREE_TO_EV


def _oracle_pairs(pos_ang, cell_ang):
    """All (i, j, image) pairs within the cutoffs at this geometry."""
    pos = np.asarray(pos_ang, float) / AU_TO_ANG
    cell = np.asarray(cell_ang, float) / AU_TO_ANG
    n = len(pos)
    h = np.zeros(3)
    for a in range(3):
        nvec = np.cross(cell[(a + 1) % 3], cell[(a + 2) % 3])
        h[a] = abs(np.linalg.det(cell)) / np.linalg.norm(nvec)
    reps = [int(math.ceil(CUT / h[a])) for a in range(3)]
    images = [
        np.array([ix, iy, iz], float) @ cell
        for ix in range(-reps[0], reps[0] + 1)
        for iy in range(-reps[1], reps[1] + 1)
        for iz in range(-reps[2], reps[2] + 1)
    ]
    pairs = []
    for i in range(n):
        for j in range(n):
            for tvec in images:
                if i == j and np.allclose(tvec, 0.0):
                    continue
                r = np.linalg.norm(pos[j] + tvec - pos[i])
                if r >= CUT:
                    continue
                pairs.append((i, j, tvec, bool(r < CN_CUT), True))
    return pairs


def _ours(s, zs, functional, damping):
    from sevennet_finetuning_tpu.data.neighborlist import neighbor_list

    uniq = sorted(set(int(z) for z in zs))
    tm = {z: k for k, z in enumerate(uniq)}
    spec = d3_spec(uniq, functional=functional, damping=damping,
                   cutoff=CUT, cn_cutoff=CN_CUT)
    arrays = d3_static_arrays(spec)
    i, j, shift, _ = neighbor_list(
        s.pos, s.cell, s.pbc, CUT * AU_TO_ANG)
    types = np.array([tm[int(z)] for z in zs], np.int32)
    return d3_energy_forces_stress(
        spec, arrays,
        jnp.asarray(s.pos, jnp.float32), jnp.asarray(types),
        jnp.asarray(np.stack([i, j]).astype(np.int32)),
        jnp.asarray(shift, jnp.float32),
        jnp.asarray(s.cell, jnp.float32),
        jnp.ones(len(i), jnp.float32),
        float(s.volume),
    )


# frozen golden values (computed from the independent float64 oracle on
# the 96-atom HfO2 cell of OUTCAR_1 at the cutoffs above); regression
# anchors for ops/d3.py AND for the oracle itself
_FROZEN = {
    ('pbe', 'bj'): -21.464379683772382,
    ('pbe', 'zero'): -16.59704576342679,
}


@pytest.fixture(scope='module')
def hfo2():
    s = read_outcar(OUTCAR)[0]
    return s, np.asarray(s.atomic_numbers)


@pytest.mark.parametrize('functional,damping',
                         [('pbe', 'bj'), ('pbe', 'zero')])
def test_total_energy_matches_independent_oracle(hfo2, functional,
                                                 damping):
    s, zs = hfo2
    e_oracle = _oracle(s.pos, s.cell, zs, functional, damping)
    e_ours, f_ours, _ = _ours(s, zs, functional, damping)
    e_ours = float(e_ours)
    assert abs(e_ours - e_oracle) < 1e-4 * abs(e_oracle), (
        e_ours, e_oracle)
    # frozen regression anchor
    frozen = _FROZEN[(functional, damping)]
    assert abs(e_oracle - frozen) < 5e-6 * abs(frozen), (e_oracle, frozen)


def test_forces_match_oracle_finite_difference(hfo2):
    s, zs = hfo2
    _, f_ours, _ = _ours(s, zs, 'pbe', 'bj')
    f_ours = np.asarray(f_ours)
    eps = 2e-3
    pairs = _oracle_pairs(s.pos, s.cell)
    for (atom, comp) in [(0, 0), (7, 2), (40, 1)]:
        pp = np.array(s.pos, float)
        pp[atom, comp] += eps
        ep = _oracle(pp, s.cell, zs, 'pbe', 'bj', pairs=pairs)
        pm = np.array(s.pos, float)
        pm[atom, comp] -= eps
        em = _oracle(pm, s.cell, zs, 'pbe', 'bj', pairs=pairs)
        f_fd = -(ep - em) / (2 * eps)
        assert abs(f_ours[atom, comp] - f_fd) < 5e-4 + 0.02 * abs(f_fd), (
            atom, comp, f_ours[atom, comp], f_fd)


def test_dispersion_config_reaches_calculator(tmp_path):
    """'dispersion' in the model config survives checkpointing and
    switches the Calculator's D3 term on."""
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.config import global_config
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.nequip import init_params
    from sevennet_finetuning_tpu.train.checkpoint import (
        save_checkpoint,
    )

    cfg = global_config(
        {K.CHEMICAL_SPECIES: ['Hf', 'O'], K.NODE_FEATURE_MULTIPLICITY: 4,
         K.LMAX: 1, K.NUM_CONVOLUTION: 2, K.CUTOFF: 4.0,
         K.DISPERSION: {'functional': 'pbe', 'damping': 'bj'}},
        {}, {},
    )
    cfg[K.TYPE_MAP] = {8: 0, 72: 1}
    cfg[K.NUM_SPECIES] = 2
    cfg[K.SHIFT] = -3.0
    cfg[K.SCALE] = 1.0
    cfg[K.CONV_DENOMINATOR] = 20.0
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    p = str(tmp_path / 'cp.pth')
    save_checkpoint(p, params, cfg, 1)

    calc = Calculator.from_checkpoint(p)
    assert calc.d3 is not None
    assert calc.d3['spec'].damping == 'bj'

    # the D3 term changes the prediction and stays finite
    s = read_outcar(OUTCAR)[0]
    out = calc.calculate(s)
    calc2 = Calculator(spec, params)  # no D3
    out2 = calc2.calculate(s)
    d = out['energy'] - out2['energy']
    assert np.isfinite(out['energy']) and abs(d) > 1e-3
    assert np.all(np.isfinite(out['forces']))


def test_md_device_loop_with_d3_conserves_energy():
    """run_device with D3 on: NVE drift stays small (the D3 edge list
    shares the skin rebuild window; padded D3 edges must not NaN)."""
    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.md import VelocityVerlet
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.nequip import init_params

    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: {8: 0, 72: 1},
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 1,
        K.NUM_CONVOLUTION: 2, K.CUTOFF: 4.0, K.IS_PARITY: True,
        K.CONV_DENOMINATOR: 20.0, K.SHIFT: -3.0, K.SCALE: 1.0,
    }
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    calc = Calculator(
        spec, params,
        d3={'functional': 'pbe', 'damping': 'bj',
            'cutoff': 15.0, 'cn_cutoff': 10.0},
    )
    s = read_outcar(OUTCAR)[0]
    md = VelocityVerlet(s, calculator=calc, dt_fs=1.0)
    md.set_temperature(300.0, seed=0)
    md.run_device(10, seg_steps=10)
    tot = np.array(md.result.total)
    assert np.all(np.isfinite(tot))
    drift = abs(tot[-1] - tot[0]) / len(s)
    assert drift < 5e-3, drift
