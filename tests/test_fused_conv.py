"""The fused-conv quadrilinear primitive family: oracle parity + AD closure.

Checks, on CPU (XLA implementations):

- mode 'msg' matches the established grouped apply_tp (through the
  e3nn<->stride layout conversions);
- modes 'x'/'sh'/'w' are the true partials of <msg, g> (vs jax.grad of
  the apply_tp composition);
- reverse, forward-over-reverse and reverse-over-reverse AD through the
  primitive agree with plain AD through apply_tp -- the training loss
  needs grad-of-grad (forces are gradients inside the loss);
- vmap batching (the DP trainer vmaps the model over the shard axis).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.fused_conv import (
    cg_apply,
    conv_messages_T,
    e3nn_to_stride,
    layout_from_spec,
    stride_to_e3nn,
)
from sevennet_finetuning_tpu.ops.tensor_product import apply_tp, uvu_tp_spec


def _setup(seed=0, E=7):
    irreps_x = Irreps('4x0e+3x1e+2x2e')
    irreps_f = Irreps('1x0e+1x1e+1x2e')
    target = Irreps('4x0e+4x1e+4x2e')
    spec = uvu_tp_spec(irreps_x, irreps_f, target)
    layout = layout_from_spec(spec)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((E, spec.irreps_in1.dim)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, spec.irreps_in2.dim)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, spec.weight_numel)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((E, spec.irreps_out.dim)), jnp.float32)
    return spec, layout, x, sh, w, g


def _msg_ref(spec, x, sh, w):
    """Edge-major e3nn-layout messages through the established path."""
    return apply_tp(spec, x, sh, w)


def _to_T(spec, layout, x, sh, w):
    x_T = e3nn_to_stride(spec.irreps_in1, x).T
    return x_T, sh.T, w.T


def test_layout_roundtrip():
    spec, layout, x, *_ = _setup()
    back = stride_to_e3nn(spec.irreps_in1,
                          e3nn_to_stride(spec.irreps_in1, x))
    np.testing.assert_allclose(back, x, atol=0)


def test_msg_mode_matches_apply_tp():
    spec, layout, x, sh, w, _ = _setup()
    msg_T = conv_messages_T(layout, *_to_T(spec, layout, x, sh, w))
    msg = stride_to_e3nn(spec.irreps_out, msg_T.T)
    ref = _msg_ref(spec, x, sh, w)
    np.testing.assert_allclose(msg, ref, rtol=2e-5, atol=2e-5)


def test_partial_modes_are_gradients():
    spec, layout, x, sh, w, g = _setup()
    x_T, sh_T, w_T = _to_T(spec, layout, x, sh, w)
    g_T = e3nn_to_stride(spec.irreps_out, g).T

    def s_ref(x, sh, w):
        return jnp.sum(_msg_ref(spec, x, sh, w) * g)

    dx_ref, dsh_ref, dw_ref = jax.grad(s_ref, argnums=(0, 1, 2))(x, sh, w)

    dx = stride_to_e3nn(spec.irreps_in1,
                        cg_apply('x', g_T, sh_T, w_T, layout).T)
    dsh = cg_apply('sh', g_T, x_T, w_T, layout).T
    dw = cg_apply('w', g_T, x_T, sh_T, layout).T
    np.testing.assert_allclose(dx, dx_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dsh, dsh_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dw, dw_ref, rtol=2e-5, atol=2e-5)


def test_ad_closure_matches_plain_ad():
    """grad, jvp-of-grad and grad-of-grad through the primitive ==
    the same through apply_tp."""
    spec, layout, x, sh, w, g = _setup()

    def loss_ref(x, sh, w):
        m = _msg_ref(spec, x, sh, w)
        return jnp.sum(jnp.tanh(m) * g)

    def loss_fused(x, sh, w):
        x_T = e3nn_to_stride(spec.irreps_in1, x).T
        m_T = conv_messages_T(layout, x_T, sh.T, w.T)
        m = stride_to_e3nn(spec.irreps_out, m_T.T)
        return jnp.sum(jnp.tanh(m) * g)

    for f_ref, f_new in ((loss_ref, loss_fused),):
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, sh, w)
        g_new = jax.grad(f_new, argnums=(0, 1, 2))(x, sh, w)
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)

    # second order: gradient w.r.t. w of a loss that CONTAINS the
    # sh-gradient (the force-in-loss structure of training)
    def force_loss_ref(w):
        fsh = jax.grad(lambda s: jnp.sum(_msg_ref(spec, x, s, w) * g))(sh)
        return jnp.sum(fsh ** 2)

    def force_loss_fused(w):
        def e(s):
            x_T = e3nn_to_stride(spec.irreps_in1, x).T
            m_T = conv_messages_T(layout, x_T, s.T, w.T)
            return jnp.sum(stride_to_e3nn(spec.irreps_out, m_T.T) * g)

        fsh = jax.grad(e)(sh)
        return jnp.sum(fsh ** 2)

    gw_ref = jax.grad(force_loss_ref)(w)
    gw_new = jax.grad(force_loss_fused)(w)
    np.testing.assert_allclose(gw_new, gw_ref, rtol=1e-4, atol=1e-4)

    # forward-over-reverse too (jax.jvp of a grad)
    tang = jnp.ones_like(w)
    _, jr = jax.jvp(jax.grad(force_loss_ref), (w,), (tang,))
    _, jn = jax.jvp(jax.grad(force_loss_fused), (w,), (tang,))
    np.testing.assert_allclose(jn, jr, rtol=1e-4, atol=1e-4)


def test_vmap_batching():
    spec, layout, x, sh, w, g = _setup()
    B = 3
    rng = np.random.default_rng(5)
    xb = jnp.asarray(rng.standard_normal((B,) + x.shape), jnp.float32)
    shb = jnp.asarray(rng.standard_normal((B,) + sh.shape), jnp.float32)
    wb = jnp.asarray(rng.standard_normal((B,) + w.shape), jnp.float32)

    def one(x, sh, w):
        x_T = e3nn_to_stride(spec.irreps_in1, x).T
        return conv_messages_T(layout, x_T, sh.T, w.T)

    out_v = jax.vmap(one)(xb, shb, wb)
    out_l = jnp.stack([one(xb[i], shb[i], wb[i]) for i in range(B)])
    np.testing.assert_allclose(out_v, out_l, rtol=2e-5, atol=2e-5)

    # batching with one unbatched arg
    out_v2 = jax.vmap(lambda xx, ww: one(xx, sh, ww))(xb, wb)
    out_l2 = jnp.stack([one(xb[i], sh, wb[i]) for i in range(B)])
    np.testing.assert_allclose(out_v2, out_l2, rtol=2e-5, atol=2e-5)


def test_jit_and_zero_weight_edges():
    """Padded edges (w == 0) produce exactly zero messages, under jit."""
    spec, layout, x, sh, w, _ = _setup()
    w = w.at[-2:].set(0.0)

    @jax.jit
    def f(x, sh, w):
        x_T = e3nn_to_stride(spec.irreps_in1, x).T
        return conv_messages_T(layout, x_T, sh.T, w.T)

    m = f(x, sh, w)
    assert np.all(np.asarray(m[:, -2:]) == 0.0)
