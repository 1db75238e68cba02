"""Scatter-fused convolution: messages + aggregation in ONE kernel.

Extends the quadrilinear family of ``ops.fused_conv`` by composing the
(dst-sorted) segment sum INTO the scalar form:

    S = sum_e C . x[e] . sh[e] . w[e] . ybar[dst[e]]

whose four partials are the ``cg_node`` modes:

    'agg' = dS/dybar : (x, sh, w)    -> [N, dim_msg]   (fused fwd)
    'xn'  = dS/dx    : (ybar, sh, w) -> [E, dim_x]
    'shn' = dS/dsh   : (ybar, x, w)  -> [E, dim_sh]
    'wn'  = dS/dw    : (ybar, x, sh) -> [E, dim_w]

Same closure as before (each mode's transpose w.r.t. any argument is
another member), so arbitrary-order AD works.

Why: the kernels are DMA-bound (PROFILE.md), and the unfused pipeline
materializes the [E, dim_msg] message tensor three times per msg-mode
call (kernel write, relayout, scatter-kernel read) -- ~1 GB of HBM
traffic for SevenNet-0's 21.5k-edge batches where the fused output is
a [N, dim_msg] ~6 MB node tensor.  The 'agg' Pallas kernel therefore
takes EDGE-MAJOR [E, dim] inputs (contiguous manual DMA), computes each
edge tile's messages in VMEM with the same unrolled wigner-3j-sparse
math, and reduces them onto the node tile with the one-hot MXU matmul
of the sorted-scatter kernel (ops/pallas_scatter).

The backward modes reuse the established feature-major per-edge kernels
through thin layout shims (gather ybar by dst, transpose in/out) -- the
fusion win is concentrated in 'agg', which is also what every JVP
tangent of the convolution flows through.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax._src import core as _jcore
from jax._src import dispatch as _jdispatch
from jax.extend.core import Primitive
from jax.interpreters import ad, batching, mlir

from .fused_conv import CGLayout, cg_apply

_MODE_LEGS = {
    'agg': ('x', 'sh', 'w'),
    'xn': ('ybar', 'sh', 'w'),
    'shn': ('ybar', 'x', 'w'),
    'wn': ('ybar', 'x', 'sh'),
}
_MODE_OUT = {'agg': 'ybar', 'xn': 'x', 'shn': 'sh', 'wn': 'w'}
_LEG_MODE = {'ybar': 'agg', 'x': 'xn', 'sh': 'shn', 'w': 'wn'}

cg_node_p = Primitive('cg_node_quadlinear')


def _leg_rows(leg, n_node, n_edge):
    return n_node if leg == 'ybar' else n_edge


def _leg_dim(layout, leg):
    return {'ybar': layout.dim_msg, 'x': layout.dim_x,
            'sh': layout.dim_sh, 'w': layout.dim_w}[leg]


def cg_node_apply(mode, a, b, c, dst, layout: CGLayout, n_node: int):
    """Bind one mode.  Edge args are edge-major [E, dim]; the node leg
    (``ybar`` / the 'agg' output) is [n_node, dim_msg].  ``dst`` must be
    sorted ascending with out-of-range sentinel padding (the collate /
    halo-plan contract)."""
    a, b, c, dst = _jcore.standard_insert_pvary(a, b, c, dst)
    return cg_node_p.bind(a, b, c, dst, layout=layout, mode=mode,
                          n_node=int(n_node))


def conv_aggregate(layout: CGLayout, x_src, sh, w, dst, n_node):
    """Fused convolution: [N, dim_msg] aggregated messages."""
    return cg_node_apply('agg', x_src, sh, w, dst, layout, n_node)


def _abstract(a, b, c, dst, *, layout, mode, n_node):
    E = dst.shape[0]
    legs = _MODE_LEGS[mode]
    for v, leg in zip((a, b, c), legs):
        rows = _leg_rows(leg, n_node, E)
        if v.ndim != 2 or v.shape != (rows, _leg_dim(layout, leg)):
            raise ValueError(
                f'cg_node[{mode}] leg {leg}: got {v.shape}, want '
                f'({rows}, {_leg_dim(layout, leg)})'
            )
    out_leg = _MODE_OUT[mode]
    shape = (_leg_rows(out_leg, n_node, E), _leg_dim(layout, out_leg))
    vma = _jcore.standard_vma_rule('cg_node_quadlinear', a, b, c, dst)
    return a.update(shape=shape, vma=vma)


cg_node_p.def_abstract_eval(_abstract)
cg_node_p.def_impl(functools.partial(_jdispatch.apply_primitive,
                                     cg_node_p))


def _use_kernel() -> bool:
    if os.environ.get('SEVENN_NO_PALLAS'):
        return False
    return os.environ.get('SEVENN_FUSED_CONV_KERNEL', '1') != '0'


def _impl(a, b, c, dst, *, layout, mode, n_node):
    """XLA composition impl (oracle + CPU + backward modes).

    Expresses each mode through the established per-edge feature-major
    family: the scatter/gather by ``dst`` stays in XLA (drop semantics
    for the out-of-range sentinel), the contraction rides cg_quadlinear
    (whose TPU lowering is the fast per-edge kernel)."""
    if mode == 'agg':
        x, sh, w = a, b, c
        msg_T = cg_apply('msg', x.T, sh.T, w.T, layout)
        return jax.ops.segment_sum(
            msg_T.T, dst, num_segments=n_node, indices_are_sorted=True)
    # backward modes: gather the node cotangent/value rows per edge
    ybar = a
    g = jnp.where((dst < n_node)[:, None],
                  ybar[jnp.minimum(dst, n_node - 1)], 0.0)
    if mode == 'xn':
        _, sh, w = a, b, c
        return cg_apply('x', g.T, sh.T, w.T, layout).T
    if mode == 'shn':
        _, x, w = a, b, c
        return cg_apply('sh', g.T, x.T, w.T, layout).T
    if mode == 'wn':
        _, x, sh = a, b, c
        return cg_apply('w', g.T, x.T, sh.T, layout).T
    raise ValueError(mode)


def _use_bwd_kernel() -> bool:
    if not _use_kernel():
        return False
    return os.environ.get('SEVENN_FUSED_BWD', '1') != '0'


def _impl_tpu(a, b, c, dst, *, layout, mode, n_node):
    if mode == 'agg' and _use_kernel():
        from .fused_conv_agg_kernel import agg_pallas

        return agg_pallas(a, b, c, dst, layout=layout, n_node=n_node)
    if mode in ('xn', 'shn', 'wn') and _use_bwd_kernel():
        from .fused_conv_bwd_kernel import bwd_pallas

        return bwd_pallas(a, b, c, dst, layout=layout, mode=mode,
                          n_node=n_node)
    return _impl(a, b, c, dst, layout=layout, mode=mode, n_node=n_node)


mlir.register_lowering(
    cg_node_p, mlir.lower_fun(_impl, multiple_results=False))
mlir.register_lowering(
    cg_node_p, mlir.lower_fun(_impl_tpu, multiple_results=False),
    platform='tpu')


def _use_multi_jvp() -> bool:
    if os.environ.get('SEVENN_NO_PALLAS'):
        return False
    return os.environ.get('SEVENN_FUSED_MULTI', '1') != '0'


def _jvp(primals, tangents, *, layout, mode, n_node):
    a, b, c, dst = primals
    out = cg_node_apply(mode, a, b, c, dst, layout, n_node)
    live = [i for i, t in enumerate(tangents[:3])
            if not isinstance(t, ad.Zero)]
    if not live:
        return out, ad.Zero.from_primal_value(out)
    if len(live) >= 2 and _use_multi_jvp():
        # one linsum equation instead of a sum of per-tangent calls:
        # same value (its lowering IS that sum, in the same order), but
        # its transpose sees all cotangent requests jointly and fuses
        # the edge-side backward modes into one gather kernel
        # (ops/fused_conv_multi)
        from .fused_conv_multi import cg_node_linsum

        t_out = cg_node_linsum(
            [tangents[i] for i in live], [a, b, c], dst, mode=mode,
            mask=tuple(live), layout=layout, n_node=n_node)
        return out, t_out
    t_out = None
    for i in live:
        args = [a, b, c]
        args[i] = tangents[i]
        term = cg_node_apply(mode, *args, dst, layout, n_node)
        t_out = term if t_out is None else t_out + term
    return out, t_out


ad.primitive_jvps[cg_node_p] = _jvp


def _transpose(ct, a, b, c, dst, *, layout, mode, n_node):
    args = (a, b, c)
    undef = [i for i, v in enumerate(args)
             if isinstance(v, ad.UndefinedPrimal)]
    assert len(undef) == 1, 'cg_node is linear in ONE arg at a time'
    i_un = undef[0]
    target_leg = _MODE_LEGS[mode][i_un]
    if isinstance(ct, ad.Zero):
        res = [None] * 4
        res[i_un] = ad.Zero(args[i_un].aval)
        return tuple(res)
    known = {_MODE_OUT[mode]: ct}
    for i, v in enumerate(args):
        if i != i_un:
            known[_MODE_LEGS[mode][i]] = v
    t_mode = _LEG_MODE[target_leg]
    val = cg_node_apply(
        t_mode, *(known[leg] for leg in _MODE_LEGS[t_mode]), dst,
        layout, n_node)
    res = [None] * 4
    res[i_un] = val
    return tuple(res)


ad.primitive_transposes[cg_node_p] = _transpose


def _batcher(args, dims, *, layout, mode, n_node):
    """Fold the batch axis into the row axes: edge legs into E, node
    legs into N with a per-batch drop-sentinel stride (n_node + 1), so
    dst sortedness and sentinel semantics survive (same scheme as
    ops.pallas_scatter's batcher)."""
    a, b, c, dst = args
    da, db, dc, dd = dims
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)

    def front(v, d):
        if d is batching.not_mapped:
            return jnp.broadcast_to(v[None], (B,) + v.shape)
        return jnp.moveaxis(v, d, 0)

    a, b, c = front(a, da), front(b, db), front(c, dc)
    dst = front(dst, dd)
    E = dst.shape[1]
    stride = n_node + 1
    boff = jnp.arange(B, dtype=dst.dtype)[:, None]
    dst_f = (jnp.minimum(dst, n_node) + boff * stride).reshape(-1)

    def flat_edge(v):
        return v.reshape(B * v.shape[1], v.shape[2])

    def flat_node(v):
        return jnp.pad(v, ((0, 0), (0, 1), (0, 0))).reshape(
            B * stride, v.shape[2])

    legs = _MODE_LEGS[mode]
    flat = [flat_node(v) if leg == 'ybar' else flat_edge(v)
            for v, leg in zip((a, b, c), legs)]
    out = cg_node_apply(mode, *flat, dst_f, layout, B * stride)
    if _MODE_OUT[mode] == 'ybar':
        out = out.reshape(B, stride, -1)[:, :n_node]
    else:
        out = out.reshape(B, E, -1)
    return out, 0


batching.primitive_batchers[cg_node_p] = _batcher
