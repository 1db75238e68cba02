"""Fused uvu CG tensor-product convolution: a quadrilinear primitive family.

The convolution message function (reference hot op:
sevenn/nn/convolution.py:104-123) is, per edge ``e``,

    msg[e, (k,kappa,u)] = sum_{i,j} C[i,j,k] * x[e, (i1,i,u)]
                          * sh[e, (i2,j)] * w[e, (path,u)]

-- TRILINEAR in (x, sh, w).  With an aggregation cotangent ``g`` the
scalar form  S = sum_e <msg(x, sh, w)[e], g[e]>  is QUADRILINEAR, and
every derivative any order of AD can ask for is one of the four partial
contractions of S:

    mode 'msg' = dS/dg  : (x, sh, w) -> [dim_msg, E]
    mode 'x'   = dS/dx  : (g, sh, w) -> [dim_x,  E]
    mode 'sh'  = dS/dsh : (g, x, w)  -> [dim_sh, E]
    mode 'w'   = dS/dw  : (g, x, sh) -> [dim_w,  E]

Each mode is linear in each of its three arguments, its JVP is a sum of
the same mode applied to tangents, and its transpose w.r.t. any argument
is ANOTHER member of the family (by symmetry of S).  Registering the
four modes as one JAX primitive with those rules therefore closes the
family under arbitrary compositions of forward/reverse AD -- which the
training loss needs (forces are gradients inside the loss: grad-of-grad).

This is the TPU answer to the reference's per-instruction e3nn einsum
chain: rounds 1-3 established (PROFILE.md section 4) that the chain's
~10 HBM round trips of small intermediates -- NOT flops -- dominate the
train step, so each mode runs as ONE Pallas kernel over edge tiles with
every intermediate in VMEM.  The XLA implementations in this module are
the correctness oracle and the CPU path.

Layout conventions (kernel-native, 'feature-major stride'):

- edge arrays are FEATURE-MAJOR: ``[dim, E]`` -- features in sublanes,
  edges in lanes, so every per-(i, path) slice is a cheap sublane slice
  of a fully-populated lane dimension (mul 32/64 chunks waste no lanes);
- within the feature axis, irrep chunks use the STRIDE layout ``[d, mul]``
  (i-major, multiplicity fastest), not e3nn's ``[mul, d]``: the
  multiplicity axis of every operand of every VPU statement is then one
  contiguous sublane run.  Conversions to/from the e3nn flat layout live
  at the (cheap, node-sized) boundaries -- see ``stride_to_e3nn``.
- ``w`` keeps the existing flat per-instruction layout (offset =
  TPInstruction.weight_offset, mul fastest) -- already stride-shaped.
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax._src import dispatch as _dispatch
from jax.extend.core import Primitive
from jax.interpreters import ad, batching, mlir

from ..irreps import Irreps
from .precision import matmul_precision
from .wigner import wigner_3j

# ---------------------------------------------------------------------------
# static layout
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CGPath:
    """One uvu instruction: all nonzero CG couplings into one output
    irrep chunk, with its per-multiplicity weight slice."""

    msg_off: int            # offset of the [d_out, mul] chunk in msg
    d_out: int
    w_off: int              # offset of the [mul] weight slice in w
    # (k, i, j, c): msg[k] += c * x[i] * sh[j] * w  (c = coeff * w3j)
    nnz: Tuple[Tuple[int, int, int, float], ...]


@dataclass(frozen=True)
class CGGroup:
    """All paths sharing one (input-irrep, filter-irrep) pair."""

    x_off: int              # offset of the [d1, mul] chunk in x
    d1: int
    mul: int
    sh_off: int             # offset of the [d2] chunk in sh
    d2: int
    paths: Tuple[CGPath, ...]


@dataclass(frozen=True)
class CGLayout:
    dim_x: int
    dim_sh: int
    dim_w: int
    dim_msg: int
    groups: Tuple[CGGroup, ...]

    @property
    def mode_dims(self) -> Dict[str, int]:
        return {'g': self.dim_msg, 'x': self.dim_x,
                'sh': self.dim_sh, 'w': self.dim_w}


@functools.lru_cache(maxsize=None)
def _layout_cache(spec):
    sl1 = spec.irreps_in1.slices()
    sl2 = spec.irreps_in2.slices()
    slo = spec.irreps_out.slices()
    groups: Dict[Tuple[int, int], list] = {}
    for ins in spec.instructions:
        if ins.mode != 'uvu':
            raise ValueError('fused conv covers uvu instructions only')
        mi2 = spec.irreps_in2[ins.i_in2]
        if mi2.mul != 1:
            raise NotImplementedError('uvu with filter mul > 1')
        groups.setdefault((ins.i_in1, ins.i_in2), []).append(ins)
    out_groups = []
    for (i1, i2), inss in sorted(groups.items()):
        mi1 = spec.irreps_in1[i1]
        mi2 = spec.irreps_in2[i2]
        paths = []
        for ins in inss:
            mo = spec.irreps_out[ins.i_out]
            C = wigner_3j(mi1.ir.l, mi2.ir.l, mo.ir.l) * ins.coeff
            nnz = tuple(
                (int(k), int(i), int(j), float(C[i, j, k]))
                for i in range(mi1.ir.dim)
                for j in range(mi2.ir.dim)
                for k in range(mo.ir.dim)
                if abs(C[i, j, k]) > 1e-12
            )
            paths.append(CGPath(
                msg_off=slo[ins.i_out].start,
                d_out=mo.ir.dim,
                w_off=ins.weight_offset,
                nnz=nnz,
            ))
        out_groups.append(CGGroup(
            x_off=sl1[i1].start, d1=mi1.ir.dim, mul=mi1.mul,
            sh_off=sl2[i2].start, d2=mi2.ir.dim,
            paths=tuple(paths),
        ))
    return CGLayout(
        dim_x=spec.irreps_in1.dim,
        dim_sh=spec.irreps_in2.dim,
        dim_w=spec.weight_numel,
        dim_msg=spec.irreps_out.dim,
        groups=tuple(out_groups),
    )


def layout_from_spec(spec) -> CGLayout:
    """Build the static CG layout from a uvu TensorProductSpec.

    Stride-layout offsets COINCIDE with the e3nn flat offsets (chunk
    sizes are equal; only the within-chunk order differs), so the
    spec's slices/weight offsets are reused as-is.
    """
    return _layout_cache(spec)


# ---------------------------------------------------------------------------
# layout conversion (node-sized boundaries; cheap)
# ---------------------------------------------------------------------------

def stride_to_e3nn(irreps: Irreps, arr: jnp.ndarray) -> jnp.ndarray:
    """[..., dim] stride layout ([d, mul] per chunk) -> e3nn ([mul, d])."""
    out = []
    for mi, sl in zip(irreps, irreps.slices()):
        chunk = arr[..., sl].reshape(arr.shape[:-1] + (mi.ir.dim, mi.mul))
        out.append(jnp.swapaxes(chunk, -1, -2).reshape(
            arr.shape[:-1] + (mi.dim,)))
    return jnp.concatenate(out, axis=-1)


def e3nn_to_stride(irreps: Irreps, arr: jnp.ndarray) -> jnp.ndarray:
    """[..., dim] e3nn layout -> stride layout (inverse of the above)."""
    out = []
    for mi, sl in zip(irreps, irreps.slices()):
        chunk = arr[..., sl].reshape(arr.shape[:-1] + (mi.mul, mi.ir.dim))
        out.append(jnp.swapaxes(chunk, -1, -2).reshape(
            arr.shape[:-1] + (mi.dim,)))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# XLA implementations (oracle + CPU path); feature-major [dim, E]
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _group_ccat(group: CGGroup) -> np.ndarray:
    """Dense [d1, d2, K] coefficient block, K = concat of path k axes."""
    K = sum(p.d_out for p in group.paths)
    C = np.zeros((group.d1, group.d2, K), np.float32)
    k0 = 0
    for p in group.paths:
        for (k, i, j, c) in p.nnz:
            C[i, j, k0 + k] = c
        k0 += p.d_out
    return C


def _xla_impl(a, b, c, *, layout: CGLayout, mode: str):
    prec = matmul_precision()
    dt = a.dtype
    E = a.shape[-1]
    if mode == 'msg':
        x, sh, w = a, b, c
    elif mode == 'x':
        g, sh, w = a, b, c
    elif mode == 'sh':
        g, x, w = a, b, c
    elif mode == 'w':
        g, x, sh = a, b, c
    else:
        raise ValueError(mode)

    out_dim = layout.mode_dims[_MODE_OUT[mode]]
    pieces = []  # (offset, array[d, E]) pairs

    for grp in layout.groups:
        Ccat = jnp.asarray(_group_ccat(grp), dt)
        if mode != 'sh':
            shg = sh[grp.sh_off:grp.sh_off + grp.d2]          # [d2, E]
        if mode in ('msg', 'w'):
            xg = x[grp.x_off:grp.x_off + grp.d1 * grp.mul]
            xg = xg.reshape(grp.d1, grp.mul, E)
        if mode in ('x', 'sh', 'w'):
            gs, ws = [], []
            for p in grp.paths:
                gp = g[p.msg_off:p.msg_off + p.d_out * grp.mul]
                gs.append(gp.reshape(p.d_out, grp.mul, E))
                if mode != 'w':
                    ws.append(w[p.w_off:p.w_off + grp.mul])
            gcat = jnp.concatenate(gs, axis=0)                # [K, mul, E]

        if mode == 'msg':
            m0 = jnp.einsum('iue,je,ijk->kue', xg, shg, Ccat,
                            precision=prec)
            k0 = 0
            for p in grp.paths:
                wp = w[p.w_off:p.w_off + grp.mul]             # [mul, E]
                mp = m0[k0:k0 + p.d_out] * wp[None]
                k0 += p.d_out
                pieces.append((p.msg_off,
                               mp.reshape(p.d_out * grp.mul, E)))
        elif mode == 'x':
            gw = gcat * jnp.concatenate(
                [jnp.broadcast_to(wp[None], (p.d_out, grp.mul, E))
                 for p, wp in zip(grp.paths, ws)], axis=0)
            dx = jnp.einsum('kue,je,ijk->iue', gw, shg, Ccat,
                            precision=prec)
            pieces.append((grp.x_off, dx.reshape(grp.d1 * grp.mul, E)))
        elif mode == 'sh':
            xg2 = x[grp.x_off:grp.x_off + grp.d1 * grp.mul]
            xg2 = xg2.reshape(grp.d1, grp.mul, E)
            gw = gcat * jnp.concatenate(
                [jnp.broadcast_to(wp[None], (p.d_out, grp.mul, E))
                 for p, wp in zip(grp.paths, ws)], axis=0)
            dsh = jnp.einsum('kue,iue,ijk->je', gw, xg2, Ccat,
                             precision=prec)
            pieces.append((grp.sh_off, dsh))
        elif mode == 'w':
            m0 = jnp.einsum('iue,je,ijk->kue', xg, shg, Ccat,
                            precision=prec)
            k0 = 0
            for p in grp.paths:
                dw = jnp.einsum('kue,kue->ue', m0[k0:k0 + p.d_out],
                                gcat[k0:k0 + p.d_out], precision=prec)
                k0 += p.d_out
                pieces.append((p.w_off, dw))

    # assemble output by offsets (accumulating overlaps -- the sh mode
    # writes the same [d2] chunk once per group sharing that filter)
    acc: Dict[int, jnp.ndarray] = {}
    sizes: Dict[int, int] = {}
    for off, arr in pieces:
        if off in acc:
            acc[off] = acc[off] + arr
        else:
            acc[off] = arr
            sizes[off] = arr.shape[0]
    parts = []
    pos = 0
    for off in sorted(acc):
        if off > pos:
            parts.append(jnp.zeros((off - pos, E), dt))
        elif off < pos:
            raise AssertionError('overlapping CG layout chunks')
        parts.append(acc[off])
        pos = off + sizes[off]
    if pos < out_dim:
        parts.append(jnp.zeros((out_dim - pos, E), dt))
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# the primitive
# ---------------------------------------------------------------------------

# leg names: the quadrilinear S has legs (g, x, sh, w); each mode
# outputs one leg and consumes the other three in this fixed order
_MODE_LEGS = {
    'msg': ('x', 'sh', 'w'),
    'x': ('g', 'sh', 'w'),
    'sh': ('g', 'x', 'w'),
    'w': ('g', 'x', 'sh'),
}
_MODE_OUT = {'msg': 'g', 'x': 'x', 'sh': 'sh', 'w': 'w'}
_LEG_MODE = {'g': 'msg', 'x': 'x', 'sh': 'sh', 'w': 'w'}

cg_quad_p = Primitive('cg_quadlinear')


def cg_apply(mode: str, a, b, c, layout: CGLayout):
    """Bind one mode of the family.  Args follow _MODE_LEGS[mode]; all
    arrays are feature-major [dim, E] with a shared trailing E."""
    from jax._src import core as _core

    # unify varying-manual-axes (shard_map) info across the args; the
    # abstract eval then propagates it -- without this, shard_map counts
    # the output as replicated and its transpose over-psums gradients by
    # the device count (caught by the halo serial==parallel force check)
    a, b, c = _core.standard_insert_pvary(a, b, c)
    return cg_quad_p.bind(a, b, c, layout=layout, mode=mode)


def _abstract(a, b, c, *, layout, mode):
    from jax._src import core as _core

    E = a.shape[-1]
    expect = [layout.mode_dims[leg] for leg in _MODE_LEGS[mode]]
    got = [v.shape[0] for v in (a, b, c)]
    if got != expect or any(v.shape[-1] != E or v.ndim != 2
                            for v in (a, b, c)):
        raise ValueError(
            f'cg_quadlinear[{mode}]: arg shapes {[v.shape for v in (a,b,c)]}'
            f' do not match layout dims {expect} x E'
        )
    out_dim = layout.mode_dims[_MODE_OUT[mode]]
    vma = _core.standard_vma_rule('cg_quadlinear', a, b, c)
    # derive from an input aval so shard_map's manual-mesh sharding
    # context carries over alongside the vma (a bare ShapedArray with
    # non-empty vma trips get_vma's empty-mesh assert)
    return a.update(shape=(out_dim, E), vma=vma)


cg_quad_p.def_abstract_eval(_abstract)
cg_quad_p.def_impl(functools.partial(_dispatch.apply_primitive, cg_quad_p))


def _use_pallas_kernel() -> bool:
    if os.environ.get('SEVENN_NO_PALLAS'):
        return False
    return os.environ.get('SEVENN_FUSED_CONV_KERNEL', '1') != '0'


def _lowering_fn(a, b, c, *, layout, mode):
    # resolved at trace/lower time; the TPU registration below routes to
    # the Pallas kernels unless disabled
    return _xla_impl(a, b, c, layout=layout, mode=mode)


def _lowering_fn_tpu(a, b, c, *, layout, mode):
    if _use_pallas_kernel():
        from .fused_conv_kernel import pallas_impl

        return pallas_impl(a, b, c, layout=layout, mode=mode)
    return _xla_impl(a, b, c, layout=layout, mode=mode)


mlir.register_lowering(
    cg_quad_p, mlir.lower_fun(_lowering_fn, multiple_results=False))
mlir.register_lowering(
    cg_quad_p, mlir.lower_fun(_lowering_fn_tpu, multiple_results=False),
    platform='tpu')


def _jvp(primals, tangents, *, layout, mode):
    out = cg_apply(mode, *primals, layout)
    t_out = None
    for i, t in enumerate(tangents):
        if isinstance(t, ad.Zero):
            continue
        args = list(primals)
        args[i] = t
        term = cg_apply(mode, *args, layout)
        t_out = term if t_out is None else t_out + term
    if t_out is None:
        t_out = ad.Zero.from_primal_value(out)
    return out, t_out


ad.primitive_jvps[cg_quad_p] = _jvp


def _transpose(ct, a, b, c, *, layout, mode):
    args = (a, b, c)
    undef = [i for i, v in enumerate(args)
             if isinstance(v, ad.UndefinedPrimal)]
    assert len(undef) == 1, 'cg_quadlinear is linear in ONE arg at a time'
    i_un = undef[0]
    target_leg = _MODE_LEGS[mode][i_un]
    if isinstance(ct, ad.Zero):
        res = [None] * 3
        res[i_un] = ad.Zero(args[i_un].aval)
        return tuple(res)
    # known leg values: the two defined args + the cotangent standing in
    # for this mode's output leg
    known = {_MODE_OUT[mode]: ct}
    for i, v in enumerate(args):
        if i != i_un:
            known[_MODE_LEGS[mode][i]] = v
    t_mode = _LEG_MODE[target_leg]
    val = cg_apply(t_mode, *(known[leg] for leg in _MODE_LEGS[t_mode]),
                   layout)
    res = [None] * 3
    res[i_un] = val
    return tuple(res)


ad.primitive_transposes[cg_quad_p] = _transpose


def _batcher(args, dims, *, layout, mode):
    # the op is elementwise over E, so batching = flattening the batch
    # axis into E: move bdim last, fold into E, unfold afterwards
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not batching.not_mapped)
    moved = []
    for v, d in zip(args, dims):
        if d is batching.not_mapped:
            vv = jnp.broadcast_to(v[..., None], v.shape + (B,))
        else:
            vv = jnp.moveaxis(v, d, -1)      # [dim, E, B]
        moved.append(vv.reshape(vv.shape[0], -1))
    out = cg_apply(mode, *moved, layout)
    out = out.reshape(out.shape[0], -1, B)
    return out, 2


batching.primitive_batchers[cg_quad_p] = _batcher


# ---------------------------------------------------------------------------
# convenience entry for the model
# ---------------------------------------------------------------------------

def conv_messages_T(layout: CGLayout, x_src_T, sh_T, w_T):
    """msg_T [dim_msg, E] from feature-major stride-layout inputs."""
    return cg_apply('msg', x_src_T, sh_T, w_T, layout)
