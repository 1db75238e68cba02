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


# ---------------------------------------------------------------------------
# second fusion layer: cg_node_gmulti / cg_node_multi_linsum
# ---------------------------------------------------------------------------

from sevennet_finetuning_tpu.ops.fused_conv_bwd_kernel import gmulti_pallas
from sevennet_finetuning_tpu.ops.fused_conv_multi import (
    cg_node_gmulti,
    cg_node_multi_linsum,
)


def test_gmulti_kernel_matches_composition():
    """Interpret-mode generalized kernel == per-job XLA composition,
    incl. two same-mode jobs accumulating into one group."""
    layout, ybar, x, sh, w, dst = _data(_spec())
    rng = np.random.default_rng(11)
    ct_sh = jnp.asarray(rng.standard_normal(sh.shape), jnp.float32)
    ct_w = jnp.asarray(rng.standard_normal(w.shape), jnp.float32)
    # x-cotangent of a joint tangent: xn(ybar, ct_sh, w) + xn(ybar, sh, ct_w)
    # plus a lone w-cotangent job: wn(ybar, x, ct_sh)
    pool = [ct_sh, w, sh, ct_w, x]
    jobs = (('x', 0, 1, 'gx'), ('x', 2, 3, 'gx'), ('w', 4, 0, 'gw'))
    groups = ('gx', 'gw')
    outs = gmulti_pallas(ybar, pool, dst, layout=layout, jobs=jobs,
                         groups=groups, n_node=12, interpret=True)
    want_gx = (_impl(ybar, ct_sh, w, dst, layout=layout, mode='xn',
                     n_node=12)
               + _impl(ybar, sh, ct_w, dst, layout=layout, mode='xn',
                       n_node=12))
    want_gw = _impl(ybar, x, ct_sh, dst, layout=layout, mode='wn',
                    n_node=12)
    np.testing.assert_allclose(outs[0], want_gx, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[1], want_gw, rtol=2e-5, atol=2e-5)


def test_gmulti_primitive_jit_and_grad():
    layout, ybar, x, sh, w, dst = _data(_spec(), E=33, N=9,
                                        sentinel_tail=3)
    rng = np.random.default_rng(12)
    ct_sh = jnp.asarray(rng.standard_normal(sh.shape), jnp.float32)
    pool = [ct_sh, w, sh, x]
    jobs = (('x', 0, 1, 'gx'), ('w', 3, 0, 'gw'))
    groups = ('gx', 'gw')

    def f(ybar, ct_sh, w, sh, x):
        outs = cg_node_gmulti(ybar, [ct_sh, w, sh, x], dst, jobs=jobs,
                              groups=groups, layout=layout, n_node=9)
        return sum(jnp.sum(o ** 2) for o in outs)

    v, gr = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(
        ybar, ct_sh, w, sh, x)
    want_gx = _impl(ybar, ct_sh, w, dst, layout=layout, mode='xn',
                    n_node=9)
    want_gw = _impl(ybar, x, ct_sh, dst, layout=layout, mode='wn',
                    n_node=9)
    np.testing.assert_allclose(
        float(v), float(jnp.sum(want_gx ** 2) + jnp.sum(want_gw ** 2)),
        rtol=1e-5)
    assert all(np.all(np.isfinite(g)) for g in gr)


def test_second_layer_census():
    """The grad-of-grad jaxpr must contain gmulti equations and NO
    single-mode backward calls (every backward fused)."""
    layout, ybar, x, sh, w, dst = _data(_spec(), E=64, N=10)
    rng = np.random.default_rng(13)
    g = jnp.asarray(rng.standard_normal((10, layout.dim_msg)),
                    jnp.float32)

    def loss(x, sh, w):
        return jnp.sum(conv_aggregate(layout, x, sh, w, dst, 10) * g)

    def outer(x, w):
        fx, fsh, fw = jax.grad(loss, argnums=(0, 1, 2))(x, sh, w)
        return jnp.sum(fx ** 2) + jnp.sum(fsh ** 2) + jnp.sum(fw ** 2)

    old = os.environ.get('SEVENN_FUSED_MULTI')
    os.environ['SEVENN_FUSED_MULTI'] = '1'
    try:
        jx = jax.make_jaxpr(jax.grad(outer, argnums=(0, 1)))(x, w)
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
    assert any(n == 'cg_node_gmulti' for n in names)
    # every backward-mode call fused: remaining singles are agg only
    from sevennet_finetuning_tpu.ops import fused_conv_agg as fca
    modes = []

    def walk2(j):
        for e in j.eqns:
            if e.primitive.name == 'cg_node_quadlinear':
                modes.append(e.params['mode'])
            for p in e.params.values():
                for q in (p if isinstance(p, (list, tuple)) else [p]):
                    if hasattr(q, 'jaxpr'):
                        walk2(q.jaxpr)

    walk2(jx.jaxpr)
    assert all(m == 'agg' for m in modes), modes


def test_multi_linsum_value_and_transpose_closure():
    """linear_transpose through a multi_linsum equation equals the
    transpose of its decomposition."""
    layout, ybar, x, sh, w, dst = _data(_spec(), E=48, N=11)
    jobs = ('xn', 'shn', 'wn')
    tmask = ('ybar', 'x', 'w')

    def f(tybar, tx, tw):
        return tuple(cg_node_multi_linsum(
            [tybar, tx, tw], [ybar, x, sh, w], dst, jobs=jobs,
            tmask=tmask, layout=layout, n_node=11))

    def f_ref(tybar, tx, tw):
        outs = []
        for j in jobs:
            legs = {'ybar': ybar, 'x': x, 'sh': sh, 'w': w}
            tan = {'ybar': tybar, 'x': tx, 'w': tw}
            from sevennet_finetuning_tpu.ops.fused_conv_agg import (
                _MODE_LEGS,
            )
            acc = None
            for leg in _MODE_LEGS[j]:
                if leg not in tan:
                    continue
                args = [tan[leg] if l == leg else legs[l]
                        for l in _MODE_LEGS[j]]
                term = _impl(*args, dst, layout=layout, mode=j,
                             n_node=11)
                acc = term if acc is None else acc + term
            outs.append(acc)
        return tuple(outs)

    prim = (ybar, x, w)
    va = f(*prim)
    vb = f_ref(*prim)
    for a, b in zip(va, vb):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    rng = np.random.default_rng(14)
    cts = tuple(jnp.asarray(rng.standard_normal(o.shape), jnp.float32)
                for o in va)
    ta = jax.linear_transpose(f, *prim)(cts)
    tb = jax.linear_transpose(f_ref, *prim)(cts)
    for a, b in zip(ta, tb):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_gagg_kernel_matches_composition():
    """Interpret-mode grouped-agg kernel == sum of single agg impls
    (left-associative, bitwise-preserving accumulators)."""
    from sevennet_finetuning_tpu.ops.fused_conv_agg_kernel import (
        gagg_pallas,
    )

    layout, ybar, x, sh, w, dst = _data(_spec())
    rng = np.random.default_rng(21)
    ct_x = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    ct_sh = jnp.asarray(rng.standard_normal(sh.shape), jnp.float32)
    ct_w = jnp.asarray(rng.standard_normal(w.shape), jnp.float32)
    pool = [ct_x, sh, w, x, ct_sh, ct_w]
    terms = ((0, 1, 2), (3, 4, 2), (3, 1, 5))
    got = gagg_pallas(pool, dst, layout=layout, terms=terms, n_node=12,
                      interpret=True)
    want = (_impl(ct_x, sh, w, dst, layout=layout, mode='agg', n_node=12)
            + _impl(x, ct_sh, w, dst, layout=layout, mode='agg',
                    n_node=12)
            + _impl(x, sh, ct_w, dst, layout=layout, mode='agg',
                    n_node=12))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gagg_primitive_grad():
    from sevennet_finetuning_tpu.ops.fused_conv_multi import cg_node_gagg

    layout, ybar, x, sh, w, dst = _data(_spec(), E=33, N=9,
                                        sentinel_tail=3)
    rng = np.random.default_rng(22)
    ct_sh = jnp.asarray(rng.standard_normal(sh.shape), jnp.float32)

    def f(x, sh, w, ct_sh):
        out = cg_node_gagg([x, sh, w, ct_sh], dst,
                           terms=((0, 1, 2), (0, 3, 2)),
                           layout=layout, n_node=9)
        return jnp.sum(out ** 2)

    v, gr = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 3)))(
        x, sh, w, ct_sh)
    want = (_impl(x, sh, w, dst, layout=layout, mode='agg', n_node=9)
            + _impl(x, ct_sh, w, dst, layout=layout, mode='agg',
                    n_node=9))
    np.testing.assert_allclose(float(v), float(jnp.sum(want ** 2)),
                               rtol=1e-5)
    assert all(np.all(np.isfinite(g)) for g in gr)
