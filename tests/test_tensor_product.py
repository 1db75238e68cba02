import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from sevennet_finetuning_tpu.irreps import Irreps, tp_out_irreps
from sevennet_finetuning_tpu.ops.tensor_product import (
    apply_tp,
    fctp_spec,
    init_tp_weights,
    uvu_tp_spec,
)
from tests.helpers import rep_matrix


def test_uvu_spec_shapes():
    x = Irreps('8x0e+4x1o')
    f = Irreps.spherical_harmonics(2, p=-1)
    out_filter = tp_out_irreps(x, f, drop_l=2, parity_mode='full')
    spec = uvu_tp_spec(x, f, out_filter)
    # paths: 0e x (0e,1o,2e) -> 3; 1o x 0e -> 1o; 1o x 1o -> 0e,1e,2e;
    # 1o x 2e -> 1o,2o,3o (3o dropped, l>2) => 3 + 1 + 3 + 2 = 9
    assert len(spec.instructions) == 9
    assert spec.weight_numel == 8 * 3 + 4 * 6


def test_uvu_equivariance():
    rng = np.random.default_rng(0)
    x_irr = Irreps('8x0e+4x1o+2x2e')
    f_irr = Irreps.spherical_harmonics(2, p=-1)
    out_filter = tp_out_irreps(x_irr, f_irr, drop_l=2, parity_mode='full')
    spec = uvu_tp_spec(x_irr, f_irr, out_filter)

    E = 5
    x = rng.normal(size=(E, x_irr.dim))
    y = rng.normal(size=(E, f_irr.dim))
    w = rng.normal(size=(E, spec.weight_numel))

    out = np.asarray(apply_tp(spec, jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(w)))

    R = Rotation.random(random_state=11).as_matrix()
    Dx = rep_matrix(x_irr, R)
    Dy = rep_matrix(f_irr, R)
    Dout = rep_matrix(spec.irreps_out, R)
    out_rot = np.asarray(
        apply_tp(spec, jnp.asarray(x @ Dx.T), jnp.asarray(y @ Dy.T),
                 jnp.asarray(w))
    )
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-4)


def test_uvu_parity_equivariance():
    # improper operation: inversion. features pick up their parity sign.
    rng = np.random.default_rng(1)
    x_irr = Irreps('4x0e+4x1o')
    f_irr = Irreps.spherical_harmonics(1, p=-1)
    out_filter = tp_out_irreps(x_irr, f_irr, drop_l=1, parity_mode='full')
    spec = uvu_tp_spec(x_irr, f_irr, out_filter)
    E = 4
    x = rng.normal(size=(E, x_irr.dim))
    y = rng.normal(size=(E, f_irr.dim))
    w = rng.normal(size=(E, spec.weight_numel))
    out = np.asarray(apply_tp(spec, jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(w)))
    I3 = np.eye(3)
    Px = rep_matrix(x_irr, I3, parity_sign=-1)
    Py = rep_matrix(f_irr, I3, parity_sign=-1)
    Pout = rep_matrix(spec.irreps_out, I3, parity_sign=-1)
    out_inv = np.asarray(
        apply_tp(spec, jnp.asarray(x @ Px.T), jnp.asarray(y @ Py.T),
                 jnp.asarray(w))
    )
    np.testing.assert_allclose(out_inv, out @ Pout.T, atol=1e-10)


def test_uvu_normalization_variance():
    # with unit-variance inputs and weights, outputs are ~unit variance
    rng = np.random.default_rng(2)
    x_irr = Irreps('64x0e')
    f_irr = Irreps('1x0e')
    spec = uvu_tp_spec(x_irr, f_irr, Irreps('64x0e'))
    E = 20000
    x = rng.normal(size=(E, 64))
    y = rng.normal(size=(E, 1))
    w = rng.normal(size=(E, spec.weight_numel))
    out = np.asarray(apply_tp(spec, jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(w)))
    assert abs(out.var() - 1.0) < 0.1


def test_fctp_equivariance():
    rng = np.random.default_rng(3)
    x_irr = Irreps('4x0e+2x1o')
    a_irr = Irreps('3x0e')
    out_irr = Irreps('5x0e+3x1o')
    spec = fctp_spec(x_irr, a_irr, out_irr)
    w = init_tp_weights(spec, rng)
    N = 6
    x = rng.normal(size=(N, x_irr.dim))
    a = rng.normal(size=(N, a_irr.dim))
    out = np.asarray(
        apply_tp(spec, jnp.asarray(x), jnp.asarray(a),
                 [jnp.asarray(wi) for wi in w])
    )
    R = Rotation.random(random_state=4).as_matrix()
    Dx = rep_matrix(x_irr, R)
    Dout = rep_matrix(out_irr, R)
    out_rot = np.asarray(
        apply_tp(spec, jnp.asarray(x @ Dx.T), jnp.asarray(a),
                 [jnp.asarray(wi) for wi in w])
    )
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-4)


def test_fctp_unreachable_output_zero():
    # outputs with no contributing path are zero-filled
    rng = np.random.default_rng(5)
    spec = fctp_spec(Irreps('4x0e'), Irreps('2x0e'), Irreps('3x0e+2x1o'))
    w = init_tp_weights(spec, rng)
    x = rng.normal(size=(2, 4))
    a = rng.normal(size=(2, 2))
    out = np.asarray(apply_tp(spec, jnp.asarray(x), jnp.asarray(a),
                              [jnp.asarray(wi) for wi in w]))
    assert out.shape == (2, 9)
    np.testing.assert_allclose(out[:, 3:], 0.0)
