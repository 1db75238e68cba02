"""Cross-mode fusion of the cg_node backward (cg_node_multi /
cg_node_linsum): interpret-mode fused kernel == XLA oracle, and the
fused AD path (SEVENN_FUSED_MULTI=1) == the per-call path bitwise.

The fusion point is the linsum transpose: cg_node's JVP emits a single
linsum equation when >= 2 tangents are live, whose transpose requests
every cotangent jointly and lowers the edge-side ones to ONE
multi-output gather kernel (see ops/fused_conv_multi docstring).
Reference counterpart: autograd through the convolution hot loop,
sevenn/nn/convolution.py:104-123.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.fused_conv import layout_from_spec
from sevennet_finetuning_tpu.ops.fused_conv_agg import _impl, conv_aggregate
from sevennet_finetuning_tpu.ops.fused_conv_bwd_kernel import multi_pallas
from sevennet_finetuning_tpu.ops.fused_conv_multi import cg_node_multi
from sevennet_finetuning_tpu.ops.tensor_product import uvu_tp_spec

JOB_SETS = [('xn', 'wn'), ('xn', 'shn'), ('shn', 'wn'),
            ('xn', 'shn', 'wn')]


def _spec():
    return uvu_tp_spec(Irreps('4x0e+3x1e+2x2e'), Irreps('1x0e+1x1e+1x2e'),
                       Irreps('4x0e+4x1e+4x2e'))


def _data(spec, E=77, N=12, seed=0, sentinel_tail=4):
    layout = layout_from_spec(spec)
    rng = np.random.default_rng(seed)
    ybar = jnp.asarray(rng.standard_normal((N, layout.dim_msg)),
                       jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, layout.dim_x)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, layout.dim_sh)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, layout.dim_w)), jnp.float32)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    if sentinel_tail:
        dst[-sentinel_tail:] = N
    return layout, ybar, x, sh, w, jnp.asarray(dst)


def _legs(mode, ybar, x, sh, w):
    return {'xn': (ybar, sh, w), 'shn': (ybar, x, w),
            'wn': (ybar, x, sh)}[mode]


@pytest.mark.parametrize('jobs', JOB_SETS)
def test_multi_kernel_matches_singles(jobs):
    layout, ybar, x, sh, w, dst = _data(_spec())
    outs = multi_pallas(ybar, x, sh, w, dst, layout=layout, jobs=jobs,
                        n_node=12, interpret=True)
    for j, got in zip(jobs, outs):
        a, b, c = _legs(j, ybar, x, sh, w)
        want = _impl(a, b, c, dst, layout=layout, mode=j, n_node=12)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                   err_msg=f'job {j}')


def test_multi_primitive_oracle_and_jit():
    layout, ybar, x, sh, w, dst = _data(_spec(), E=33, N=9,
                                        sentinel_tail=3)
    outs = jax.jit(
        lambda *a: cg_node_multi(*a, jobs=('xn', 'shn', 'wn'),
                                 layout=layout, n_node=9)
    )(ybar, x, sh, w, dst)
    for j, got in zip(('xn', 'shn', 'wn'), outs):
        a, b, c = _legs(j, ybar, x, sh, w)
        want = _impl(a, b, c, dst, layout=layout, mode=j, n_node=9)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _grads(flag, layout, x, sh, w, dst, N, g):
    old = os.environ.get('SEVENN_FUSED_MULTI')
    os.environ['SEVENN_FUSED_MULTI'] = flag
    try:
        def loss(x, sh, w):
            return jnp.sum(conv_aggregate(layout, x, sh, w, dst, N) * g)

        first = jax.grad(loss, argnums=(0, 1, 2))(x, sh, w)

        def outer(x, w):
            fx, fsh, fw = jax.grad(loss, argnums=(0, 1, 2))(x, sh, w)
            return (jnp.sum(fx ** 2) + jnp.sum(fsh ** 2)
                    + 0.5 * jnp.sum(fw ** 2))

        second = jax.grad(outer, argnums=(0, 1))(x, w)
        fwd_over_rev = jax.jvp(
            lambda xx: jax.grad(loss)(xx, sh, w), (x,),
            (jnp.ones_like(x),))[1]
        batched = jax.vmap(
            lambda a, b, c: jax.grad(loss, argnums=(0, 1, 2))(a, b, c)
        )(jnp.stack([x, 2 * x]), jnp.stack([sh, sh]),
          jnp.stack([w, 0.5 * w]))
        return first, second, fwd_over_rev, batched
    finally:
        if old is None:
            os.environ.pop('SEVENN_FUSED_MULTI', None)
        else:
            os.environ['SEVENN_FUSED_MULTI'] = old


def test_fused_ad_bitwise_equals_percall_ad():
    layout, ybar, x, sh, w, dst = _data(_spec(), E=64, N=10)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.standard_normal((10, layout.dim_msg)),
                    jnp.float32)
    ref = _grads('0', layout, x, sh, w, dst, 10, g)
    got = _grads('1', layout, x, sh, w, dst, 10, g)
    for name, ra, rb in zip(('grad', 'grad-of-grad', 'jvp-of-grad',
                             'vmap-grad'), ref, got):
        for la, lb in zip(jax.tree_util.tree_leaves(ra),
                          jax.tree_util.tree_leaves(rb)):
            assert jnp.array_equal(la, lb), f'{name} not bitwise equal'


def test_linsum_transpose_emits_multi():
    """The grad jaxpr w.r.t. two legs must contain ONE fused multi call
    (jobs xn+wn) instead of two single-mode backward calls."""
    layout, ybar, x, sh, w, dst = _data(_spec(), E=32, N=8)
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((8, layout.dim_msg)),
                    jnp.float32)
    old = os.environ.get('SEVENN_FUSED_MULTI')
    os.environ['SEVENN_FUSED_MULTI'] = '1'
    try:
        jx = jax.make_jaxpr(jax.grad(
            lambda x, w: jnp.sum(
                conv_aggregate(layout, x, sh, w, dst, 8) * g),
            argnums=(0, 1)))(x, w)
    finally:
        if old is None:
            os.environ.pop('SEVENN_FUSED_MULTI', None)
        else:
            os.environ['SEVENN_FUSED_MULTI'] = old
    names = []

    def walk(j):
        for e in j.eqns:
            names.append(e.primitive.name)
            for p in e.params.values():
                for q in (p if isinstance(p, (list, tuple)) else [p]):
                    if hasattr(q, 'jaxpr'):
                        walk(q.jaxpr)

    walk(jx.jaxpr)
    multis = [n for n in names if n == 'cg_node_multi']
    singles = [n for n in names if n == 'cg_node_quadlinear']
    assert len(multis) == 1
    # only the (dead) primal forward agg may remain as a single call
    assert len(singles) <= 1
