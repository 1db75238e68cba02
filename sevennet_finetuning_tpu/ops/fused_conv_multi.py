"""Cross-mode fusion for the cg_node quadrilinear family.

Round 5 found (PROFILE.md section 6) that after the gather-fused
backward kernels, the dominant per-call cost of every backward mode is
MATERIALIZING the per-edge cotangent g[:, e] = ybar[:, dst[e]] -- the
windowed ybar DMA plus the one-hot MXU selection stream dim_msg * E
values no matter how they are tiled.  The train step's AD graph calls
xn/shn/wn in CLUSTERS that share one (ybar, dst) pair (verified on the
bench jaxpr: every backward call shares its cotangent with 1-6
siblings), so each cluster re-materializes the same g.

This module makes those clusters visible to the compiler as single
equations, closing the family under arbitrary-order AD:

- ``cg_node_linsum``: the multi-tangent JVP sum

      sum_i cg_node[mode](legs with tangent_i substituted at slot i)

  emitted by cg_node's JVP rule as ONE primitive when >= 2 tangents are
  live.  Its value/lowering is exactly that sum (so evaluating it is
  unchanged), but its TRANSPOSE sees all cotangent requests jointly and
  emits ONE fused multi-mode backward.

- ``cg_node_multi``: several backward modes (subset of xn/shn/wn) over
  one shared (ybar, x, sh, w, dst), lowered on TPU to a single Pallas
  kernel that performs the window DMA + stacked one-hot selection ONCE
  and shares the per-group g*w / x*sh products across modes
  (ops/fused_conv_bwd_kernel.multi_pallas).  Each output is
  bitwise-identical to the corresponding single-mode kernel.

Transpose algebra: with the scalar form
S = sum_e C . x[e] . sh[e] . w[e] . ybar[dst[e]] (see fused_conv_agg),
the cotangent of tangent leg ``l`` of a linsum over mode ``m`` is
cg_node[LEG_MODE[l]] applied to the canonical legs (ybar, x, sh, w)
with the output cotangent substituted at m's OWN output leg -- one rule
for all four modes, and the edge-side targets (x/sh/w) share everything
except their emit loop, which is what cg_node_multi fuses.

Reference counterpart: autograd through the convolution hot loop,
sevenn/nn/convolution.py:104-123 -- torch replays each backward
separately; the TPU answer is to fuse what shares traffic.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax._src import core as _jcore
from jax._src import dispatch as _jdispatch
from jax.extend.core import Primitive
from jax.interpreters import ad, batching, mlir

from .fused_conv import CGLayout
from .fused_conv_agg import (
    _LEG_MODE,
    _MODE_LEGS,
    _MODE_OUT,
    _impl as _single_impl,
    _leg_dim,
    _leg_rows,
    _use_bwd_kernel,
    cg_node_apply,
)

# canonical leg order for cg_node_multi inputs
_CANON = ('ybar', 'x', 'sh', 'w')
# which backward mode produces the cotangent for each canonical leg
_EDGE_JOB = {'x': 'xn', 'sh': 'shn', 'w': 'wn'}


def _use_multi() -> bool:
    if os.environ.get('SEVENN_NO_PALLAS'):
        return False
    return os.environ.get('SEVENN_FUSED_MULTI', '1') != '0'


# ---------------------------------------------------------------------------
# cg_node_multi: fused multi-mode backward
# ---------------------------------------------------------------------------

cg_node_multi_p = Primitive('cg_node_multi')
cg_node_multi_p.multiple_results = True


def cg_node_multi(ybar, x, sh, w, dst, *, jobs, layout: CGLayout,
                  n_node: int):
    """Bind the fused multi-mode backward.  ``jobs`` is a tuple drawn
    from ('xn', 'shn', 'wn'); returns one edge-major array per job."""
    jobs = tuple(jobs)
    assert jobs and all(j in _EDGE_JOB.values() for j in jobs)
    ybar, x, sh, w, dst = _jcore.standard_insert_pvary(ybar, x, sh, w,
                                                       dst)
    return cg_node_multi_p.bind(ybar, x, sh, w, dst, jobs=jobs,
                                layout=layout, n_node=int(n_node))


def _multi_abstract(ybar, x, sh, w, dst, *, jobs, layout, n_node):
    E = dst.shape[0]
    for v, leg in zip((ybar, x, sh, w), _CANON):
        rows = _leg_rows(leg, n_node, E)
        if v.ndim != 2 or v.shape != (rows, _leg_dim(layout, leg)):
            raise ValueError(
                f'cg_node_multi leg {leg}: got {v.shape}, want '
                f'({rows}, {_leg_dim(layout, leg)})'
            )
    vma = _jcore.standard_vma_rule('cg_node_multi', ybar, x, sh, w, dst)
    return [
        ybar.update(shape=(E, _leg_dim(layout, _MODE_OUT[j])), vma=vma)
        for j in jobs
    ]


cg_node_multi_p.def_abstract_eval(_multi_abstract)
cg_node_multi_p.def_impl(
    functools.partial(_jdispatch.apply_primitive, cg_node_multi_p))


def _job_args(ybar, x, sh, w, job):
    """Args of one job in its cg_node leg order (after ybar)."""
    canon = {'ybar': ybar, 'x': x, 'sh': sh, 'w': w}
    return [canon[leg] for leg in _MODE_LEGS[job]]


def _multi_lower(ybar, x, sh, w, dst, *, jobs, layout, n_node):
    """Composition lowering (CPU path + oracle): one single-mode impl
    per job -- the same XLA gather + cg_quadlinear composition the
    single-mode primitive uses."""
    return [
        _single_impl(*_job_args(ybar, x, sh, w, j), dst, layout=layout,
                     mode=j, n_node=n_node)
        for j in jobs
    ]


def _multi_lower_tpu(ybar, x, sh, w, dst, *, jobs, layout, n_node):
    if _use_bwd_kernel() and _use_multi():
        from .fused_conv_bwd_kernel import bwd_pallas, multi_pallas

        if len(jobs) == 1:
            return [bwd_pallas(*_job_args(ybar, x, sh, w, jobs[0]), dst,
                               layout=layout, mode=jobs[0],
                               n_node=n_node)]
        return multi_pallas(ybar, x, sh, w, dst, layout=layout,
                            jobs=jobs, n_node=n_node)
    return _multi_lower(ybar, x, sh, w, dst, jobs=jobs, layout=layout,
                        n_node=n_node)


mlir.register_lowering(
    cg_node_multi_p, mlir.lower_fun(_multi_lower, multiple_results=True))
mlir.register_lowering(
    cg_node_multi_p,
    mlir.lower_fun(_multi_lower_tpu, multiple_results=True),
    platform='tpu')


def _multi_jvp(primals, tangents, *, jobs, layout, n_node):
    ybar, x, sh, w, dst = primals
    out = cg_node_multi(ybar, x, sh, w, dst, jobs=jobs, layout=layout,
                        n_node=n_node)
    tan = dict(zip(_CANON, tangents[:4]))
    t_out = []
    for j, o in zip(jobs, out):
        legs = _MODE_LEGS[j]
        live = [i for i, leg in enumerate(legs)
                if not isinstance(tan[leg], ad.Zero)]
        if not live:
            t_out.append(ad.Zero.from_primal_value(o))
            continue
        primal_legs = _job_args(ybar, x, sh, w, j)
        if len(live) == 1:
            i = live[0]
            args = list(primal_legs)
            args[i] = tan[legs[i]]
            t_out.append(cg_node_apply(j, *args, dst, layout, n_node))
        else:
            t_out.append(cg_node_linsum(
                [tan[legs[i]] for i in live], primal_legs, dst,
                mode=j, mask=tuple(live), layout=layout,
                n_node=n_node))
    return out, t_out


ad.primitive_jvps[cg_node_multi_p] = _multi_jvp


def _multi_transpose(cts, ybar, x, sh, w, dst, *, jobs, layout, n_node):
    """Cotangents for whichever canonical legs are linear: for job j
    (output leg o_j), <out_j, ct_j> is the quadrilinear S with ct_j at
    o_j, so d/dleg = cg_node[LEG_MODE[leg]] of S's remaining legs."""
    args = {'ybar': ybar, 'x': x, 'sh': sh, 'w': w}
    res = {leg: None for leg in _CANON}
    for j, ct in zip(jobs, cts):
        if isinstance(ct, ad.Zero):
            continue
        s_legs = dict(args)
        s_legs[_MODE_OUT[j]] = ct
        for leg in _CANON:
            if not isinstance(args[leg], ad.UndefinedPrimal):
                continue
            if leg == _MODE_OUT[j]:
                # out_j does not depend on its own leg
                continue
            t_mode = _LEG_MODE[leg]
            val = cg_node_apply(
                t_mode,
                *(s_legs[l] for l in _MODE_LEGS[t_mode]),
                dst, layout, n_node)
            res[leg] = val if res[leg] is None else res[leg] + val
    out = []
    for leg in _CANON:
        if isinstance(args[leg], ad.UndefinedPrimal):
            out.append(res[leg] if res[leg] is not None
                       else ad.Zero(args[leg].aval))
        else:
            out.append(None)
    out.append(None)  # dst
    return tuple(out)


ad.primitive_transposes[cg_node_multi_p] = _multi_transpose


def _front(v, d, B):
    if d is batching.not_mapped:
        return jnp.broadcast_to(v[None], (B,) + v.shape)
    return jnp.moveaxis(v, d, 0)


def _multi_batcher(args, dims, *, jobs, layout, n_node):
    """Fold the batch axis like fused_conv_agg's batcher: edge legs into
    E, the node leg into N with a per-batch drop-sentinel stride."""
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)
    ybar, x, sh, w, dst = (_front(v, d, B) for v, d in zip(args, dims))
    E = dst.shape[1]
    stride = n_node + 1
    boff = jnp.arange(B, dtype=dst.dtype)[:, None]
    dst_f = (jnp.minimum(dst, n_node) + boff * stride).reshape(-1)
    ybar_f = jnp.pad(ybar, ((0, 0), (0, 1), (0, 0))).reshape(
        B * stride, ybar.shape[2])

    def flat_edge(v):
        return v.reshape(B * v.shape[1], v.shape[2])

    outs = cg_node_multi(ybar_f, flat_edge(x), flat_edge(sh),
                         flat_edge(w), dst_f, jobs=jobs, layout=layout,
                         n_node=B * stride)
    return [o.reshape(B, E, -1) for o in outs], [0] * len(jobs)


batching.primitive_batchers[cg_node_multi_p] = _multi_batcher


# ---------------------------------------------------------------------------
# cg_node_linsum: multi-tangent JVP sum as one equation
# ---------------------------------------------------------------------------

cg_node_linsum_p = Primitive('cg_node_linsum')


def cg_node_linsum(tangents, legs, dst, *, mode, mask, layout: CGLayout,
                   n_node: int):
    """Bind sum_i cg_node[mode](legs with tangents[i] at slot mask[i]).

    ``legs`` are the mode's three primal legs (fused_conv_agg
    _MODE_LEGS order); ``mask`` the strictly increasing leg slots that
    carry tangents."""
    mask = tuple(mask)
    assert len(tangents) == len(mask) >= 1
    flat = [*tangents, *legs, dst]
    flat = _jcore.standard_insert_pvary(*flat)
    return cg_node_linsum_p.bind(*flat, mode=mode, mask=mask,
                                 layout=layout, n_node=int(n_node))


def _linsum_decomp(tangents, legs, dst, *, mode, mask, layout, n_node):
    out = None
    for t, i in zip(tangents, mask):
        args = list(legs)
        args[i] = t
        term = cg_node_apply(mode, *args, dst, layout, n_node)
        out = term if out is None else out + term
    return out


def _linsum_split(args, mask):
    k = len(mask)
    return list(args[:k]), list(args[k:k + 3]), args[k + 3]


def _linsum_abstract(*args, mode, mask, layout, n_node):
    tangents, legs, dst = _linsum_split(args, mask)
    E = dst.shape[0]
    for i, t in zip(mask, tangents):
        if t.shape != legs[i].shape:
            raise ValueError(
                f'cg_node_linsum[{mode}]: tangent at slot {i} has shape '
                f'{t.shape}, leg has {legs[i].shape}')
    out_leg = _MODE_OUT[mode]
    shape = (_leg_rows(out_leg, n_node, E), _leg_dim(layout, out_leg))
    vma = _jcore.standard_vma_rule('cg_node_linsum', *args)
    return args[0].update(shape=shape, vma=vma)


cg_node_linsum_p.def_abstract_eval(_linsum_abstract)
cg_node_linsum_p.def_impl(
    functools.partial(_jdispatch.apply_primitive, cg_node_linsum_p))


def _linsum_lower(*args, mode, mask, layout, n_node):
    tangents, legs, dst = _linsum_split(args, mask)
    return _linsum_decomp(tangents, legs, dst, mode=mode, mask=mask,
                          layout=layout, n_node=n_node)


mlir.register_lowering(
    cg_node_linsum_p, mlir.lower_fun(_linsum_lower,
                                     multiple_results=False))


def _linsum_jvp(primals, tangents_in, *, mode, mask, layout, n_node):
    """out = sum_i f(legs[mask_i -> t_i]); each term is trilinear in its
    args, so the differential substitutes every input tangent one at a
    time into every term."""
    p_tan, p_legs, dst = _linsum_split(primals, mask)
    d_tan, d_legs, _ = _linsum_split(tangents_in, mask)
    out = cg_node_linsum(p_tan, p_legs, dst, mode=mode, mask=mask,
                         layout=layout, n_node=n_node)
    t_out = None

    def accum(v):
        nonlocal t_out
        t_out = v if t_out is None else t_out + v

    for term_idx, slot in enumerate(mask):
        term_args = list(p_legs)
        term_args[slot] = p_tan[term_idx]
        # tangent of the substituted tangent input
        if not isinstance(d_tan[term_idx], ad.Zero):
            a = list(term_args)
            a[slot] = d_tan[term_idx]
            accum(cg_node_apply(mode, *a, dst, layout, n_node))
        # tangents of the remaining primal legs in this term
        for j in range(3):
            if j == slot or isinstance(d_legs[j], ad.Zero):
                continue
            a = list(term_args)
            a[j] = d_legs[j]
            accum(cg_node_apply(mode, *a, dst, layout, n_node))
    if t_out is None:
        t_out = ad.Zero.from_primal_value(out)
    return out, t_out


ad.primitive_jvps[cg_node_linsum_p] = _linsum_jvp


def _linsum_transpose(ct, *args, mode, mask, layout, n_node):
    """THE fusion point: all tangent slots are linear variables, so one
    transpose call returns every cotangent -- the edge-side ones
    (x/sh/w targets) from ONE cg_node_multi."""
    tangents, legs, dst = _linsum_split(args, mask)
    assert all(isinstance(t, ad.UndefinedPrimal) for t in tangents), (
        'cg_node_linsum is linear in its tangent slots only')
    if isinstance(ct, ad.Zero):
        return tuple([ad.Zero(t.aval) for t in tangents]
                     + [None] * 3 + [None])
    # canonical legs with ct standing at this mode's output slot
    canon = {_MODE_OUT[mode]: ct}
    for leg_name, leg_val in zip(_MODE_LEGS[mode], legs):
        canon[leg_name] = leg_val
    target_legs = [_MODE_LEGS[mode][i] for i in mask]
    edge_targets = [l for l in target_legs if l != 'ybar']
    res = {}
    if len(edge_targets) >= 2:
        jobs = tuple(_EDGE_JOB[l] for l in edge_targets)
        outs = cg_node_multi(canon['ybar'], canon['x'], canon['sh'],
                             canon['w'], dst, jobs=jobs, layout=layout,
                             n_node=n_node)
        for l, o in zip(edge_targets, outs):
            res[l] = o
    elif edge_targets:
        l = edge_targets[0]
        t_mode = _EDGE_JOB[l]
        res[l] = cg_node_apply(
            t_mode, *(canon[m] for m in _MODE_LEGS[t_mode]), dst,
            layout, n_node)
    if 'ybar' in target_legs:
        res['ybar'] = cg_node_apply(
            'agg', canon['x'], canon['sh'], canon['w'], dst, layout,
            n_node)
    return tuple([res[l] for l in target_legs] + [None] * 3 + [None])


ad.primitive_transposes[cg_node_linsum_p] = _linsum_transpose


def _linsum_batcher(args, dims, *, mode, mask, layout, n_node):
    """Batch by re-entering the decomposition under vmap: cg_node's own
    batcher handles the sentinel-stride folding."""
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)
    moved = [_front(v, d, B) for v, d in zip(args, dims)]

    def run(*flat):
        tangents, legs, dst = _linsum_split(flat, mask)
        return _linsum_decomp(tangents, legs, dst, mode=mode, mask=mask,
                              layout=layout, n_node=n_node)

    out = jax.vmap(run)(*moved)
    return out, 0


batching.primitive_batchers[cg_node_linsum_p] = _linsum_batcher
