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
    live_jobs = [
        j for j in jobs
        if any(not isinstance(tan[leg], ad.Zero)
               for leg in _MODE_LEGS[j])
    ]
    if len(live_jobs) >= 2 and _use_multi():
        # emit the whole cluster's tangent as ONE equation so the outer
        # transpose can fuse every edge-side cotangent (see
        # cg_node_multi_linsum)
        tmask = tuple(l for l in _CANON
                      if not isinstance(tan[l], ad.Zero))
        t_live = cg_node_multi_linsum(
            [tan[l] for l in tmask], [ybar, x, sh, w], dst,
            jobs=tuple(live_jobs), tmask=tmask, layout=layout,
            n_node=n_node)
        t_of = dict(zip(live_jobs, t_live))
        t_out = [t_of[j] if j in t_of
                 else ad.Zero.from_primal_value(o)
                 for j, o in zip(jobs, out)]
        return out, t_out
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


# ---------------------------------------------------------------------------
# cg_node_gmulti: generalized fused backward -- arbitrary jobs over ONE
# shared (ybar, dst) with per-job legs from an array pool, outputs
# grouped (jobs of a group accumulate).  This is what the transpose of
# a JOINT JVP needs: e.g. the x-cotangent of a fused (xn, shn, wn)
# backward's tangent is xn(ybar, ct_shn, w) + xn(ybar, sh, ct_wn) --
# two same-mode calls with different legs sharing the gather.
# ---------------------------------------------------------------------------

# emit-mode <-> node-mode naming
_EMIT2NODE = {'x': 'xn', 'sh': 'shn', 'w': 'wn'}
_NODE2EMIT = {v: k for k, v in _EMIT2NODE.items()}
# leg roles (b, c) of each emit mode, in cg_node leg order after ybar
_EMIT_LEGS = {'x': ('sh', 'w'), 'sh': ('x', 'w'), 'w': ('x', 'sh')}

cg_node_gmulti_p = Primitive('cg_node_gmulti')
cg_node_gmulti_p.multiple_results = True


def cg_node_gmulti(ybar, pool, dst, *, jobs, groups, layout: CGLayout,
                   n_node: int):
    """Bind the generalized fused backward.  ``pool``: edge-major
    arrays; ``jobs``: tuple of (emit_mode, b_idx, c_idx, group) with
    (b_idx, c_idx) indexing the pool in the mode's leg order;
    ``groups``: distinct group ids in output order."""
    jobs = tuple(jobs)
    groups = tuple(groups)
    flat = _jcore.standard_insert_pvary(ybar, *pool, dst)
    return cg_node_gmulti_p.bind(*flat, jobs=jobs, groups=groups,
                                 layout=layout, n_node=int(n_node))


def _group_emit(jobs, groups):
    """emit mode of each group (jobs in one group share it)."""
    out = {}
    for (m, _, _, g) in jobs:
        assert out.setdefault(g, m) == m, 'mixed emit modes in group'
    return [out[g] for g in groups]


def _gmulti_abstract(ybar, *rest, jobs, groups, layout, n_node):
    pool, dst = rest[:-1], rest[-1]
    E = dst.shape[0]
    if ybar.shape != (n_node, layout.dim_msg):
        raise ValueError(f'gmulti ybar: got {ybar.shape}')
    for (m, bi, ci, _) in jobs:
        bl, cl = _EMIT_LEGS[m]
        for idx, leg in ((bi, bl), (ci, cl)):
            want = (E, _leg_dim(layout, leg))
            if pool[idx].shape != want:
                raise ValueError(
                    f'gmulti job {m}: pool[{idx}] is {pool[idx].shape},'
                    f' want {want}')
    vma = _jcore.standard_vma_rule('cg_node_gmulti', ybar, *rest)
    return [
        ybar.update(shape=(E, _leg_dim(layout, m)), vma=vma)
        for m in _group_emit(jobs, groups)
    ]


cg_node_gmulti_p.def_abstract_eval(_gmulti_abstract)
cg_node_gmulti_p.def_impl(
    functools.partial(_jdispatch.apply_primitive, cg_node_gmulti_p))


def _gmulti_lower(ybar, *rest, jobs, groups, layout, n_node):
    pool, dst = rest[:-1], rest[-1]
    acc = {}
    for (m, bi, ci, grp) in jobs:
        val = _single_impl(ybar, pool[bi], pool[ci], dst, layout=layout,
                           mode=_EMIT2NODE[m], n_node=n_node)
        acc[grp] = val if grp not in acc else acc[grp] + val
    return [acc[g] for g in groups]


def _gmulti_lower_tpu(ybar, *rest, jobs, groups, layout, n_node):
    if _use_bwd_kernel() and _use_multi():
        from .fused_conv_bwd_kernel import gmulti_pallas

        pool, dst = rest[:-1], rest[-1]
        return gmulti_pallas(ybar, list(pool), dst, layout=layout,
                             jobs=jobs, groups=groups, n_node=n_node)
    return _gmulti_lower(ybar, *rest, jobs=jobs, groups=groups,
                         layout=layout, n_node=n_node)


mlir.register_lowering(
    cg_node_gmulti_p,
    mlir.lower_fun(_gmulti_lower, multiple_results=True))
mlir.register_lowering(
    cg_node_gmulti_p,
    mlir.lower_fun(_gmulti_lower_tpu, multiple_results=True),
    platform='tpu')


def _gmulti_jvp(primals, tangents, *, jobs, groups, layout, n_node):
    ybar, rest = primals[0], primals[1:]
    pool, dst = rest[:-1], rest[-1]
    t_ybar, t_rest = tangents[0], tangents[1:]
    t_pool = t_rest[:-1]
    out = cg_node_gmulti(ybar, list(pool), dst, jobs=jobs,
                         groups=groups, layout=layout, n_node=n_node)
    t_by_group = {}

    def accum(grp, v):
        t_by_group[grp] = v if grp not in t_by_group \
            else t_by_group[grp] + v

    for (m, bi, ci, grp) in jobs:
        mn = _EMIT2NODE[m]
        b, c = pool[bi], pool[ci]
        if not isinstance(t_ybar, ad.Zero):
            accum(grp, cg_node_apply(mn, t_ybar, b, c, dst, layout,
                                     n_node))
        if not isinstance(t_pool[bi], ad.Zero):
            accum(grp, cg_node_apply(mn, ybar, t_pool[bi], c, dst,
                                     layout, n_node))
        if not isinstance(t_pool[ci], ad.Zero):
            accum(grp, cg_node_apply(mn, ybar, b, t_pool[ci], dst,
                                     layout, n_node))
    t_out = [
        t_by_group.get(g) if g in t_by_group
        else ad.Zero.from_primal_value(o)
        for g, o in zip(groups, out)
    ]
    return out, t_out


ad.primitive_jvps[cg_node_gmulti_p] = _gmulti_jvp


def _gmulti_transpose(cts, ybar, *rest, jobs, groups, layout, n_node):
    pool, dst = rest[:-1], rest[-1]
    ct_of = dict(zip(groups, cts))
    n_in = 1 + len(pool)
    res = [None] * n_in

    def accum(i, v):
        res[i] = v if res[i] is None else res[i] + v

    for (m, bi, ci, grp) in jobs:
        ct = ct_of[grp]
        if isinstance(ct, ad.Zero):
            continue
        bl, cl = _EMIT_LEGS[m]
        # S_j canonical legs: the job's own target slot carries ct
        canon = {'ybar': ybar, 'x': None, 'sh': None, 'w': None}
        canon[m] = ct
        canon[bl] = pool[bi]
        canon[cl] = pool[ci]
        if isinstance(ybar, ad.UndefinedPrimal):
            accum(0, cg_node_apply(
                'agg', canon['x'], canon['sh'], canon['w'], dst,
                layout, n_node))
        for idx, leg in ((bi, bl), (ci, cl)):
            if isinstance(pool[idx], ad.UndefinedPrimal):
                t_mode = _LEG_MODE[leg]
                accum(1 + idx, cg_node_apply(
                    t_mode, *(canon[l] for l in _MODE_LEGS[t_mode]),
                    dst, layout, n_node))
    out = []
    for i, v in enumerate((ybar,) + tuple(pool)):
        if isinstance(v, ad.UndefinedPrimal):
            out.append(res[i] if res[i] is not None
                       else ad.Zero(v.aval))
        else:
            out.append(None)
    out.append(None)  # dst
    return tuple(out)


ad.primitive_transposes[cg_node_gmulti_p] = _gmulti_transpose


def _gmulti_batcher(args, dims, *, jobs, groups, layout, n_node):
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)
    moved = [_front(v, d, B) for v, d in zip(args, dims)]

    def run(*flat):
        ybar, pool, dst = flat[0], flat[1:-1], flat[-1]
        return _gmulti_lower(ybar, *pool, dst, jobs=jobs, groups=groups,
                             layout=layout, n_node=n_node)

    outs = jax.vmap(run)(*moved)
    return outs, [0] * len(groups)


batching.primitive_batchers[cg_node_gmulti_p] = _gmulti_batcher


# ---------------------------------------------------------------------------
# cg_node_multi_linsum: the JOINT JVP of a cg_node_multi equation as
# ONE multi-output equation -- so the outer transpose sees every
# cotangent request of the cluster at once and can emit (a) the ybar
# cotangent as per-job agg calls and (b) ALL edge-side cotangents as a
# single cg_node_gmulti sharing one gather/selection.
# ---------------------------------------------------------------------------

cg_node_multi_linsum_p = Primitive('cg_node_multi_linsum')
cg_node_multi_linsum_p.multiple_results = True


def cg_node_multi_linsum(tangents, canon_legs, dst, *, jobs, tmask,
                         layout: CGLayout, n_node: int):
    """Bind the joint tangent of a multi-job backward: output per job j

        sum_{leg in legs(m_j) & tmask} cg_node[m_j](legs_j with the
                                       leg's tangent substituted)

    ``tangents``: arrays for the canonical legs named in ``tmask``
    (subset of _CANON, in _CANON order); ``canon_legs``: the four
    primal canonical legs (ybar, x, sh, w)."""
    tmask = tuple(tmask)
    assert len(tangents) == len(tmask) >= 1
    assert list(tmask) == [l for l in _CANON if l in tmask]
    flat = _jcore.standard_insert_pvary(*tangents, *canon_legs, dst)
    return cg_node_multi_linsum_p.bind(*flat, jobs=tuple(jobs),
                                       tmask=tmask, layout=layout,
                                       n_node=int(n_node))


def _mls_split(args, tmask):
    k = len(tmask)
    return list(args[:k]), list(args[k:k + 4]), args[k + 4]


def _mls_decomp(tangents, canon_legs, dst, *, jobs, tmask, layout,
                n_node):
    """Value: per job, the tangent-substituted sum in leg order --
    matching the per-job linsum lowering it replaces bitwise."""
    tan = dict(zip(tmask, tangents))
    canon = dict(zip(_CANON, canon_legs))
    outs = []
    for j in jobs:
        acc = None
        for leg in _MODE_LEGS[j]:
            if leg not in tan:
                continue
            args = [tan[leg] if l == leg else canon[l]
                    for l in _MODE_LEGS[j]]
            term = cg_node_apply(j, *args, dst, layout, n_node)
            acc = term if acc is None else acc + term
        if acc is None:
            E = dst.shape[0]
            acc = jnp.zeros((E, _leg_dim(layout, _MODE_OUT[j])),
                            canon_legs[0].dtype)
        outs.append(acc)
    return outs


def _mls_abstract(*args, jobs, tmask, layout, n_node):
    tangents, canon_legs, dst = _mls_split(args, tmask)
    E = dst.shape[0]
    vma = _jcore.standard_vma_rule('cg_node_multi_linsum', *args)
    return [
        args[0].update(shape=(E, _leg_dim(layout, _MODE_OUT[j])),
                       vma=vma)
        for j in jobs
    ]


cg_node_multi_linsum_p.def_abstract_eval(_mls_abstract)
cg_node_multi_linsum_p.def_impl(
    functools.partial(_jdispatch.apply_primitive,
                      cg_node_multi_linsum_p))


def _mls_lower(*args, jobs, tmask, layout, n_node):
    tangents, canon_legs, dst = _mls_split(args, tmask)
    return _mls_decomp(tangents, canon_legs, dst, jobs=jobs,
                       tmask=tmask, layout=layout, n_node=n_node)


mlir.register_lowering(
    cg_node_multi_linsum_p,
    mlir.lower_fun(_mls_lower, multiple_results=True))


def _mls_transpose(cts, *args, jobs, tmask, layout, n_node):
    """Cotangents for the tangent slots (all UndefinedPrimal): leg
    l's cotangent collects cg_node[LEG_MODE[l]] over the jobs that
    consume l, with ct_j standing at each job's own output slot.  The
    edge-side targets ride ONE cg_node_gmulti (shared gather); jobs
    are iterated in REVERSE to match the accumulation order of the
    per-job-linsum graph this equation replaces."""
    tangents, canon_legs, dst = _mls_split(args, tmask)
    assert all(isinstance(t, ad.UndefinedPrimal) for t in tangents)
    canon = dict(zip(_CANON, canon_legs))
    live = [(j, ct) for j, ct in zip(jobs, cts)
            if not isinstance(ct, ad.Zero)]
    res = {l: None for l in tmask}

    # ybar cotangent: a sum of agg terms -- one grouped kernel when
    # several (shared slab DMA + visit loop, per-term accumulators keep
    # the sum bitwise the separate kernels + XLA adds)
    if 'ybar' in tmask and live:
        term_legs = []
        for j, ct in reversed(live):
            s = dict(canon)
            s[_MODE_OUT[j]] = ct
            term_legs.append((s['x'], s['sh'], s['w']))
        if len(term_legs) == 1:
            res['ybar'] = cg_node_apply('agg', *term_legs[0], dst,
                                        layout, n_node)
        else:
            pool = []
            pool_ids = {}

            def pidx_a(arr):
                key = id(arr)
                if key not in pool_ids:
                    pool_ids[key] = len(pool)
                    pool.append(arr)
                return pool_ids[key]

            terms = tuple(
                (pidx_a(xx), pidx_a(ss), pidx_a(ww))
                for (xx, ss, ww) in term_legs)
            res['ybar'] = cg_node_gagg(pool, dst, terms=terms,
                                       layout=layout, n_node=n_node)

    # edge-side cotangents: one gmulti over the shared (ybar, dst)
    edge_targets = [l for l in tmask if l != 'ybar']
    if edge_targets and live:
        pool = []
        pool_ids = {}

        def pidx(arr):
            key = id(arr)
            if key not in pool_ids:
                pool_ids[key] = len(pool)
                pool.append(arr)
            return pool_ids[key]

        gjobs = []
        hit = set()
        for l in edge_targets:
            for j, ct in reversed(live):
                if l not in _MODE_LEGS[j] or l == _MODE_OUT[j]:
                    continue
                s = dict(canon)
                s[_MODE_OUT[j]] = ct
                bl, cl = _EMIT_LEGS[l]
                gjobs.append((l, pidx(s[bl]), pidx(s[cl]), l))
                hit.add(l)
        if gjobs:
            groups = [l for l in edge_targets if l in hit]
            outs = cg_node_gmulti(canon['ybar'], pool, dst, jobs=gjobs,
                                  groups=groups, layout=layout,
                                  n_node=n_node)
            for l, o in zip(groups, outs):
                res[l] = o

    out = []
    for l, t in zip(tmask, tangents):
        out.append(res[l] if res[l] is not None else ad.Zero(t.aval))
    return tuple(out + [None] * 4 + [None])


ad.primitive_transposes[cg_node_multi_linsum_p] = _mls_transpose


def _mls_jvp(primals, tangents_in, *, jobs, tmask, layout, n_node):
    """Differential of the joint tangent (third-order paths): expand
    every term's per-input substitution via single calls."""
    p_tan, p_legs, dst = _mls_split(primals, tmask)
    d_tan, d_legs, _ = _mls_split(tangents_in, tmask)
    out = cg_node_multi_linsum(p_tan, p_legs, dst, jobs=jobs,
                               tmask=tmask, layout=layout,
                               n_node=n_node)
    tan = dict(zip(tmask, p_tan))
    dtan = dict(zip(tmask, d_tan))
    canon = dict(zip(_CANON, p_legs))
    dcanon = dict(zip(_CANON, d_legs))
    t_out = []
    for j, o in zip(jobs, out):
        acc = None

        def accum(v):
            nonlocal acc
            acc = v if acc is None else acc + v

        for leg in _MODE_LEGS[j]:
            if leg not in tan:
                continue
            # term = cg_node[j](canon with tan[leg] at leg)
            term_args = {l: (tan[leg] if l == leg else canon[l])
                         for l in _MODE_LEGS[j]}
            # tangent of the substituted slot
            if not isinstance(dtan[leg], ad.Zero):
                a = dict(term_args)
                a[leg] = dtan[leg]
                accum(cg_node_apply(
                    j, *(a[l] for l in _MODE_LEGS[j]), dst, layout,
                    n_node))
            # tangents of the remaining primal slots
            for l2 in _MODE_LEGS[j]:
                if l2 == leg or isinstance(dcanon[l2], ad.Zero):
                    continue
                a = dict(term_args)
                a[l2] = dcanon[l2]
                accum(cg_node_apply(
                    j, *(a[l] for l in _MODE_LEGS[j]), dst, layout,
                    n_node))
        t_out.append(acc if acc is not None
                     else ad.Zero.from_primal_value(o))
    return out, t_out


ad.primitive_jvps[cg_node_multi_linsum_p] = _mls_jvp


def _mls_batcher(args, dims, *, jobs, tmask, layout, n_node):
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)
    moved = [_front(v, d, B) for v, d in zip(args, dims)]

    def run(*flat):
        tangents, canon_legs, dst = _mls_split(flat, tmask)
        return _mls_decomp(tangents, canon_legs, dst, jobs=jobs,
                           tmask=tmask, layout=layout, n_node=n_node)

    outs = jax.vmap(run)(*moved)
    return outs, [0] * len(jobs)


batching.primitive_batchers[cg_node_multi_linsum_p] = _mls_batcher


# ---------------------------------------------------------------------------
# cg_node_gagg: grouped forward/agg terms over one shared dst -- the
# ybar cotangent of a joint tangent is a SUM of agg terms with legs
# drawn from a pool; one kernel shares the slab DMA and visit loop
# (ops/fused_conv_agg_kernel.gagg_pallas), keeping one accumulator per
# term so the sum is bitwise the separate-kernels + XLA adds.
# ---------------------------------------------------------------------------

cg_node_gagg_p = Primitive('cg_node_gagg')


def cg_node_gagg(pool, dst, *, terms, layout: CGLayout, n_node: int):
    """Bind sum of agg terms; ``terms``: tuple of (x_idx, sh_idx,
    w_idx) into ``pool``, combined left-associatively in order."""
    terms = tuple(terms)
    assert terms
    flat = _jcore.standard_insert_pvary(*pool, dst)
    return cg_node_gagg_p.bind(*flat, terms=terms, layout=layout,
                               n_node=int(n_node))


def _gagg_abstract(*args, terms, layout, n_node):
    pool, dst = args[:-1], args[-1]
    E = dst.shape[0]
    dims = {'x': layout.dim_x, 'sh': layout.dim_sh, 'w': layout.dim_w}
    for (xi, si, wi) in terms:
        for idx, leg in ((xi, 'x'), (si, 'sh'), (wi, 'w')):
            if pool[idx].shape != (E, dims[leg]):
                raise ValueError(
                    f'gagg: pool[{idx}] is {pool[idx].shape}, want '
                    f'({E}, {dims[leg]})')
    vma = _jcore.standard_vma_rule('cg_node_gagg', *args)
    return args[0].update(shape=(n_node, layout.dim_msg), vma=vma)


cg_node_gagg_p.def_abstract_eval(_gagg_abstract)
cg_node_gagg_p.def_impl(
    functools.partial(_jdispatch.apply_primitive, cg_node_gagg_p))


def _gagg_lower(*args, terms, layout, n_node):
    pool, dst = args[:-1], args[-1]
    acc = None
    for (xi, si, wi) in terms:
        term = _single_impl(pool[xi], pool[si], pool[wi], dst,
                            layout=layout, mode='agg', n_node=n_node)
        acc = term if acc is None else acc + term
    return acc


def _gagg_lower_tpu(*args, terms, layout, n_node):
    if _use_bwd_kernel() and _use_multi():
        from .fused_conv_agg_kernel import gagg_pallas

        pool, dst = args[:-1], args[-1]
        return gagg_pallas(list(pool), dst, layout=layout, terms=terms,
                           n_node=n_node)
    return _gagg_lower(*args, terms=terms, layout=layout,
                       n_node=n_node)


mlir.register_lowering(
    cg_node_gagg_p, mlir.lower_fun(_gagg_lower, multiple_results=False))
mlir.register_lowering(
    cg_node_gagg_p,
    mlir.lower_fun(_gagg_lower_tpu, multiple_results=False),
    platform='tpu')


def _gagg_jvp(primals, tangents, *, terms, layout, n_node):
    pool, dst = primals[:-1], primals[-1]
    t_pool = tangents[:-1]
    out = cg_node_gagg(list(pool), dst, terms=terms, layout=layout,
                       n_node=n_node)
    t_out = None
    for (xi, si, wi) in terms:
        for pos, idx in enumerate((xi, si, wi)):
            if isinstance(t_pool[idx], ad.Zero):
                continue
            legs = [pool[xi], pool[si], pool[wi]]
            legs[pos] = t_pool[idx]
            term = cg_node_apply('agg', *legs, dst, layout, n_node)
            t_out = term if t_out is None else t_out + term
    if t_out is None:
        t_out = ad.Zero.from_primal_value(out)
    return out, t_out


ad.primitive_jvps[cg_node_gagg_p] = _gagg_jvp


def _gagg_transpose(ct, *args, terms, layout, n_node):
    pool, dst = args[:-1], args[-1]
    res = [None] * len(pool)
    if isinstance(ct, ad.Zero):
        return tuple([ad.Zero(p.aval)
                      if isinstance(p, ad.UndefinedPrimal) else None
                      for p in pool] + [None])

    def accum(i, v):
        res[i] = v if res[i] is None else res[i] + v

    for (xi, si, wi) in terms:
        # ct stands at the ybar slot of this term's quadrilinear S
        canon = {'ybar': ct, 'x': pool[xi], 'sh': pool[si],
                 'w': pool[wi]}
        for idx, leg in ((xi, 'x'), (si, 'sh'), (wi, 'w')):
            if isinstance(pool[idx], ad.UndefinedPrimal):
                t_mode = _LEG_MODE[leg]
                accum(idx, cg_node_apply(
                    t_mode, *(canon[l] for l in _MODE_LEGS[t_mode]),
                    dst, layout, n_node))
    out = []
    for p, r in zip(pool, res):
        if isinstance(p, ad.UndefinedPrimal):
            out.append(r if r is not None else ad.Zero(p.aval))
        else:
            out.append(None)
    out.append(None)
    return tuple(out)


ad.primitive_transposes[cg_node_gagg_p] = _gagg_transpose


def _gagg_batcher(args, dims, *, terms, layout, n_node):
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)
    moved = [_front(v, d, B) for v, d in zip(args, dims)]

    def run(*flat):
        return _gagg_lower(*flat, terms=terms, layout=layout,
                           n_node=n_node)

    return jax.vmap(run)(*moved), 0


batching.primitive_batchers[cg_node_gagg_p] = _gagg_batcher
