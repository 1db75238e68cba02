import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.gate import apply_gate, gate_spec
from sevennet_finetuning_tpu.ops.linear import (
    apply_linear,
    init_linear_weights,
    linear_spec,
)
from sevennet_finetuning_tpu.ops.mlp import mlp_apply, mlp_init
from tests.helpers import rep_matrix


def test_linear_path_normalization():
    # single-output fan: coeff = 1/sqrt(mul_in) (as in the reference's
    # frozen TorchScript: 1/sqrt(89), 1/sqrt(128), ...)
    spec = linear_spec(Irreps('89x0e'), Irreps('128x0e'))
    assert len(spec.instructions) == 1
    np.testing.assert_allclose(
        spec.instructions[0].coeff, 1.0 / np.sqrt(89.0)
    )


def test_linear_equivariance():
    rng = np.random.default_rng(0)
    irr_in = Irreps('8x0e+4x1o+2x2e')
    irr_out = Irreps('6x0e+6x1o+3x2e')
    spec = linear_spec(irr_in, irr_out)
    w = init_linear_weights(spec, rng)
    x = rng.normal(size=(5, irr_in.dim))
    out = np.asarray(
        apply_linear(spec, [jnp.asarray(wi) for wi in w], jnp.asarray(x))
    )
    R = Rotation.random(random_state=1).as_matrix()
    Din = rep_matrix(irr_in, R)
    Dout = rep_matrix(irr_out, R)
    out_rot = np.asarray(
        apply_linear(spec, [jnp.asarray(wi) for wi in w],
                     jnp.asarray(x @ Din.T))
    )
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-5)


def test_linear_mismatched_irreps_dropped():
    # 1o in input has no 1o output -> silently dropped; 2e out zero
    spec = linear_spec(Irreps('4x0e+2x1o'), Irreps('3x0e+1x2e'))
    rng = np.random.default_rng(1)
    w = init_linear_weights(spec, rng)
    x = rng.normal(size=(2, 10))
    out = np.asarray(
        apply_linear(spec, [jnp.asarray(wi) for wi in w], jnp.asarray(x))
    )
    assert out.shape == (2, 8)
    np.testing.assert_allclose(out[:, 3:], 0.0)


def test_linear_variance_preserved():
    rng = np.random.default_rng(2)
    spec = linear_spec(Irreps('128x0e'), Irreps('128x0e'))
    w = init_linear_weights(spec, rng)
    x = rng.normal(size=(4096, 128))
    out = np.asarray(
        apply_linear(spec, [jnp.asarray(wi) for wi in w], jnp.asarray(x))
    )
    assert abs(out.var() - 1.0) < 0.1


def test_linear_bias():
    spec = linear_spec(Irreps('4x0e+2x1o'), Irreps('3x0e+2x1o'), biases=True)
    rng = np.random.default_rng(3)
    w = init_linear_weights(spec, rng)
    # bias instruction exists for the scalar output only
    bias_ins = [i for i in spec.instructions if i.i_in == -1]
    assert len(bias_ins) == 1 and bias_ins[0].weight_shape == (3,)


def test_gate_structure():
    irr_out = Irreps('8x0e+4x1o+2x2e')
    spec = gate_spec(irr_out, {'e': 'silu', 'o': 'tanh'},
                     {'e': 'silu', 'o': 'tanh'})
    # gate input: 8 scalars + 6 gates (one 0e block per gated entry,
    # matching e3nn's unsimplified layout) + l>0 part
    assert repr(spec.irreps_in.simplify()) == '14x0e+4x1o+2x2e'
    assert repr(spec.irreps_gates) == '4x0e+2x0e'
    assert repr(spec.irreps_out) == '8x0e+4x1o+2x2e'


def test_gate_equivariance():
    rng = np.random.default_rng(4)
    irr_out = Irreps('8x0e+4x1o+2x2e')
    spec = gate_spec(irr_out, {'e': 'silu', 'o': 'tanh'},
                     {'e': 'silu', 'o': 'tanh'})
    x = rng.normal(size=(5, spec.irreps_in.dim))
    out = np.asarray(apply_gate(spec, jnp.asarray(x)))
    R = Rotation.random(random_state=5).as_matrix()
    Din = rep_matrix(spec.irreps_in, R)
    Dout = rep_matrix(spec.irreps_out, R)
    out_rot = np.asarray(apply_gate(spec, jnp.asarray(x @ Din.T)))
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-5)


def test_gate_odd_scalar_gates():
    # no 0e scalars -> gates are odd
    spec = gate_spec(Irreps('4x0o+2x1o'), {'e': 'silu', 'o': 'tanh'},
                     {'e': 'silu', 'o': 'tanh'})
    assert repr(spec.irreps_gates) == '2x0o'


def test_mlp_variance_and_shape():
    rng = np.random.default_rng(6)
    ws = mlp_init([8, 64, 64, 30], rng)
    x = rng.normal(size=(4096, 8))
    out = np.asarray(mlp_apply([jnp.asarray(w) for w in ws],
                               jnp.asarray(x), 'silu'))
    assert out.shape == (4096, 30)
    # normalized activations keep activations near unit variance
    assert 0.3 < out.var() < 3.0
