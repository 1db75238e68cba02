"""Gaunt-FFT tensor products and interaction types."""

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
from sevennet_finetuning_tpu.ops.gaunt import (
    apply_gaunt_pb,
    gaunt_pb_spec,
    init_gaunt_pb,
    to_fourier,
    to_spherical,
    y_coeffs,
    z_coeffs,
)
from sevennet_finetuning_tpu.ops.spherical import spherical_harmonics
from tests.helpers import rep_matrix


def test_z_inverts_y():
    for L in (1, 2, 3):
        Y = y_coeffs(L).reshape((L + 1) ** 2, -1)
        Z = z_coeffs(L)
        np.testing.assert_allclose(
            (Y @ Z).real, np.eye((L + 1) ** 2), atol=1e-10
        )


def test_gaunt_product_identity():
    """The FFT pipeline computes exact pointwise products on the sphere."""
    L1, L2 = 2, 1
    rng = np.random.default_rng(0)
    cf = rng.normal(size=((L1 + 1) ** 2,))
    cg = rng.normal(size=((L2 + 1) ** 2,))
    f_four = np.asarray(to_fourier(jnp.asarray(cf)[None], L1))[0]
    g_four = np.asarray(to_fourier(jnp.asarray(cg)[None], L2))[0]
    Lo = L1 + L2
    size = (2 * Lo + 1, 2 * Lo + 1)
    conv = np.fft.ifft2(
        np.fft.fft2(f_four, s=size) * np.fft.fft2(g_four, s=size)
    )
    c_out = np.asarray(to_spherical(jnp.asarray(conv)[None], Lo, Lo))[0]

    sh1 = spherical_harmonics(L1)
    sh2 = spherical_harmonics(L2)
    sho = spherical_harmonics(Lo)
    v = rng.normal(size=(16, 3))
    f_v = np.asarray(sh1(jnp.asarray(v))) @ cf
    g_v = np.asarray(sh2(jnp.asarray(v))) @ cg
    prod_v = np.asarray(sho(jnp.asarray(v))) @ c_out
    np.testing.assert_allclose(prod_v, f_v * g_v, atol=1e-4)


def test_gaunt_pb_equivariance():
    irr = Irreps('3x0e+3x1o+3x2e')
    spec = gaunt_pb_spec(irr, irr, correlation=2)
    rng = np.random.default_rng(1)
    w = init_gaunt_pb(spec, rng)
    x = rng.normal(size=(4, irr.dim))
    out = np.asarray(apply_gaunt_pb(spec, w, jnp.asarray(x)))
    R = Rotation.random(random_state=2).as_matrix()
    D = rep_matrix(irr, R)
    out_rot = np.asarray(apply_gaunt_pb(spec, w, jnp.asarray(x @ D.T)))
    np.testing.assert_allclose(out_rot, out @ D.T, atol=1e-4)


def _gaunt_model(itype, n=20):
    rng = np.random.default_rng(0)
    s = Structure(
        species=['Si' if i % 2 else 'O' for i in range(n)],
        pos=rng.uniform(0, 8.0, (n, 3)),
        cell=np.eye(3) * 8.0,
    )
    tm = {8: 0, 14: 1}
    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 2,
        K.NUM_CONVOLUTION: 3, K.CUTOFF: 3.5, K.IS_PARITY: True,
        K.INTERACTION_TYPE: itype, K.CORRELATION: 2,
        K.CONV_DENOMINATOR: 8.0, K.SHIFT: -2.0, K.SCALE: 1.0,
    }
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    g = structure_to_graph(s, 3.5, tm)
    b = collate([g], n_node=n, n_edge=g[K.EDGE_IDX].shape[1], n_graph=1)
    b = {k: jnp.asarray(v) for k, v in b.items()
         if k not in (K.INFO, K.USER_LABEL)}
    return s, spec, params, b


@pytest.mark.parametrize('itype', ['gaunt_gate', 'gaunt'])
def test_gaunt_model_equivariance(itype):
    s, spec, params, b = _gaunt_model(itype)
    out = apply_model(spec, params, b)
    E = float(out[K.PRED_TOTAL_ENERGY][0])
    F = np.asarray(out[K.PRED_FORCE])
    assert np.isfinite(E) and np.isfinite(F).all()
    R = Rotation.random(random_state=3).as_matrix()
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


def test_gaunt_forces_finite_difference():
    s, spec, params, b = _gaunt_model('gaunt')
    b64 = {k: (v.astype(jnp.float64) if v.dtype == jnp.float32 else v)
           for k, v in b.items()}
    fwd = jax.jit(lambda bb: apply_model(spec, params, bb))
    out = fwd(b64)
    eps = 1e-5
    a, ax = 3, 1
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


def test_gaunt_requires_parity():
    tm = {8: 0, 14: 1}
    cfg = {
        K.NUM_SPECIES: 2, K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 2,
        K.NUM_CONVOLUTION: 2, K.CUTOFF: 3.5, K.IS_PARITY: False,
        K.INTERACTION_TYPE: 'gaunt', K.CORRELATION: 2,
        K.CONV_DENOMINATOR: 8.0, K.SHIFT: 0.0, K.SCALE: 1.0,
    }
    with pytest.raises(ValueError):
        build_model_spec(cfg)


@pytest.mark.parametrize('rfft', ['0', '1'])
@pytest.mark.parametrize('itype', ['gaunt_gate', 'gaunt'])
def test_gaunt_halo_parallel(itype, rfft, monkeypatch):
    """Serial == spatially-decomposed agreement for the Gaunt-FFT
    interaction types (the same contract the nequip/mace halo tests
    assert; reference analogue:
    pretrained_potentials/SevenNet_0__11July2024/README.md:29-30).

    rfft='1' pins the round-5 fix: the Hermitian fast path's rFFT
    primitives propagate vma, so it now runs (and differentiates --
    forces) under the shard_map halo executor too."""
    monkeypatch.setenv('SEVENN_GAUNT_RFFT', rfft)
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sevennet_finetuning_tpu.parallel.halo import (
        SP_AXIS,
        build_halo_plan,
        gather_forces,
        make_halo_forward,
        scatter_positions,
    )

    s, spec, params, b = _gaunt_model(itype)
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


def test_hermitian_rfft_conv_matches_complex(monkeypatch):
    """The real-FFT (Hermitian) Gaunt convolution path equals the
    complex-FFT formulation in values and gradients (reference ships
    the same fast path: sevenn/nn/gaunt_util.py:279-313,
    convolution.py:261-403)."""
    import os

    import jax

    from sevennet_finetuning_tpu.ops import gaunt as G
    from sevennet_finetuning_tpu.ops.mlp import mlp_init

    spec = G.gaunt_conv_spec(
        Irreps('4x0e+4x1o+4x2e'), Irreps('1x0e+1x1o+1x2e'),
        Irreps('4x0e+4x1o+4x2e'), (8, 8), 8, 'silu')
    rng = np.random.default_rng(0)
    N, E = 10, 37
    x = jnp.asarray(rng.standard_normal((N, spec.irreps_x.dim)),
                    jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, spec.irreps_filter.dim)),
                     jnp.float32)
    emb = jnp.asarray(rng.standard_normal((E, 8)), jnp.float32)
    src = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    wp = [jnp.asarray(w) for w in
          mlp_init(spec.radial_hs + (spec.weight_numel,), rng)]
    den = jnp.ones((1,), jnp.float32)

    def run():
        return G.apply_gaunt_conv(spec, wp, x, sh, emb, src, dst, N,
                                  den, sorted_dst=True)

    def grad():
        return jax.grad(
            lambda xx: jnp.sum(G.apply_gaunt_conv(
                spec, wp, xx, sh, emb, src, dst, N, den, True) ** 2)
        )(x)

    monkeypatch.setenv('SEVENN_GAUNT_RFFT', '0')
    a, ga = run(), grad()
    monkeypatch.setenv('SEVENN_GAUNT_RFFT', '1')
    b, gb = run(), grad()
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-6 * scale)
    gscale = float(jnp.max(jnp.abs(ga)))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=2e-6 * gscale)


def test_rfft_pair_transposes_match_jax():
    """The gaunt_rfft2_pair primitive's hand-written transpose rules
    (the vma-propagating replacements for jax's rfft transposes) must
    equal jax.linear_transpose of the plain FFTs, and close under
    second-order AD (forces differentiate through them)."""
    import jax

    from sevennet_finetuning_tpu.ops.gaunt import _irfft2_sym, _rfft2_sym

    rng = np.random.default_rng(3)
    for L in (1, 2, 3):
        M = 2 * L + 1
        h = jnp.asarray(
            rng.standard_normal((2, M, L + 1))
            + 1j * rng.standard_normal((2, M, L + 1)), jnp.complex64)
        g = jnp.asarray(rng.standard_normal((2, M, M)), jnp.float32)

        ct_ours = jax.linear_transpose(
            lambda x: _irfft2_sym(x, M), h)(g)[0]
        ct_jax = jax.linear_transpose(
            lambda x: jnp.fft.irfft2(x, s=(M, M)), h)(g)[0]
        np.testing.assert_allclose(np.asarray(ct_ours),
                                   np.asarray(ct_jax),
                                   rtol=1e-5, atol=1e-6)

        S = jnp.asarray(rng.standard_normal((2, M, M)), jnp.float32)
        gc = jnp.asarray(
            rng.standard_normal((2, M, L + 1))
            + 1j * rng.standard_normal((2, M, L + 1)), jnp.complex64)
        ct_ours = jax.linear_transpose(lambda x: _rfft2_sym(x), S)(gc)[0]
        ct_jax = jax.linear_transpose(
            lambda x: jnp.fft.rfft2(x), S)(gc)[0]
        np.testing.assert_allclose(np.asarray(ct_ours),
                                   np.asarray(ct_jax),
                                   rtol=1e-5, atol=1e-6)

    # grad-of-grad closure (force-in-loss shape)
    M = 5
    h0 = jnp.asarray(rng.standard_normal((M, 3))
                     + 1j * rng.standard_normal((M, 3)), jnp.complex64)

    def f(x):
        return jnp.sum(_irfft2_sym(x, M) ** 3)

    def f_ref(x):
        return jnp.sum(jnp.fft.irfft2(x, s=(M, M)) ** 3)

    g2_ours = jax.grad(lambda x: jnp.sum(jnp.abs(
        jax.grad(f, holomorphic=False)(x)) ** 2))
    g2_ref = jax.grad(lambda x: jnp.sum(jnp.abs(
        jax.grad(f_ref, holomorphic=False)(x)) ** 2))
    np.testing.assert_allclose(np.asarray(g2_ours(h0)),
                               np.asarray(g2_ref(h0)),
                               rtol=1e-4, atol=1e-5)
