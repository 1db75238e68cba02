"""Scatter-fused convolution ('cg_node' family): composition parity +
AD closure + interpret-mode kernel.

Oracle: the unfused composition segment_sum(apply_tp(...)) on e3nn
layouts.  Padded (sentinel-dst) edges must drop exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.fused_conv import (
    e3nn_to_stride,
    layout_from_spec,
    stride_to_e3nn,
)
from sevennet_finetuning_tpu.ops.fused_conv_agg import conv_aggregate
from sevennet_finetuning_tpu.ops.fused_conv_agg_kernel import agg_pallas
from sevennet_finetuning_tpu.ops.tensor_product import apply_tp, uvu_tp_spec


def _setup(seed=0, E=33, N=9):
    spec = uvu_tp_spec(Irreps('4x0e+3x1e+2x2e'), Irreps('1x0e+1x1e+1x2e'),
                       Irreps('4x0e+4x1e+4x2e'))
    layout = layout_from_spec(spec)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((E, spec.irreps_in1.dim)),
                    jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, spec.irreps_in2.dim)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, spec.weight_numel)),
                    jnp.float32)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dst[-4:] = N  # sentinel tail
    w = w.at[-4:].set(0.0)  # padded edges carry zero weights
    return spec, layout, x, sh, w, jnp.asarray(dst), N


def _ref(spec, x, sh, w, dst, N):
    msg = apply_tp(spec, x, sh, w)
    return jax.ops.segment_sum(msg, dst, num_segments=N)


def _fused(spec, layout, x, sh, w, dst, N):
    xs = e3nn_to_stride(spec.irreps_in1, x)
    out_s = conv_aggregate(layout, xs, sh, w, dst, N)
    return stride_to_e3nn(spec.irreps_out, out_s)


def test_agg_matches_composition():
    spec, layout, x, sh, w, dst, N = _setup()
    np.testing.assert_allclose(
        _fused(spec, layout, x, sh, w, dst, N),
        _ref(spec, x, sh, w, dst, N), rtol=2e-5, atol=2e-5)


def test_agg_grad_and_grad_of_grad():
    spec, layout, x, sh, w, dst, N = _setup()
    rng = np.random.default_rng(7)
    gy = jnp.asarray(rng.standard_normal((N, spec.irreps_out.dim)),
                     jnp.float32)

    def loss_ref(x, sh, w):
        return jnp.sum(jnp.tanh(_ref(spec, x, sh, w, dst, N)) * gy)

    def loss_fused(x, sh, w):
        return jnp.sum(jnp.tanh(_fused(spec, layout, x, sh, w, dst, N))
                       * gy)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, sh, w)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, sh, w)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)

    # force-in-loss structure (grad through the sh-gradient)
    def fl(mk):
        def inner(w):
            fsh = jax.grad(
                lambda s: jnp.sum(mk(x, s, w) * gy))(sh)
            return jnp.sum(fsh ** 2)
        return inner

    gw_ref = jax.grad(fl(lambda *a: _ref(spec, *a, dst, N)))(w)
    gw_new = jax.grad(fl(lambda *a: _fused(spec, layout, *a, dst, N)))(w)
    np.testing.assert_allclose(gw_new, gw_ref, rtol=1e-4, atol=1e-4)


def test_agg_vmap():
    spec, layout, x, sh, w, dst, N = _setup()
    B = 3
    rng = np.random.default_rng(5)
    xb = jnp.asarray(rng.standard_normal((B,) + x.shape), jnp.float32)

    def one(xx):
        return _fused(spec, layout, xx, sh, w, dst, N)

    out_v = jax.vmap(one)(xb)
    out_l = jnp.stack([one(xb[i]) for i in range(B)])
    np.testing.assert_allclose(out_v, out_l, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('E,N', [(150, 40), (64, 300)])
def test_agg_kernel_interpret_matches_xla(E, N):
    spec, layout, x, sh, w, dst, _ = _setup(seed=E, E=E, N=N)
    xs = e3nn_to_stride(spec.irreps_in1, x)
    ref = jax.ops.segment_sum(
        stride_to_e3nn(
            spec.irreps_out,
            conv_aggregate(layout, xs, sh, w, dst, N)),
        jnp.zeros((N,), jnp.int32), num_segments=1)  # just reduce ref
    out_k = agg_pallas(xs, sh, w, dst, layout=layout, n_node=N,
                       interpret=True)
    out_x = conv_aggregate(layout, xs, sh, w, dst, N)
    scale = float(jnp.max(jnp.abs(out_x))) or 1.0
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=2e-6, atol=2e-6 * scale)
