"""Pallas TPU kernels for the fused-conv quadrilinear family.

One kernel per AD mode of ``ops.fused_conv`` (msg / x / sh / w), each a
single ``pallas_call`` over edge tiles: the whole radial-weighted CG
contraction for a tile -- every (i, j) product, every per-path coupling,
every weight multiply -- happens in VMEM, replacing the per-instruction
einsum chain's ~10 HBM round trips per block (PROFILE.md section 4).

Mapping (why this layout wins on TPU):

- arrays are feature-major ``[dim, E]``: edges fill the 128-lane axis
  completely for EVERY multiplicity (32/64/128), and each per-(i, path)
  operand is one contiguous sublane slice -- no lane-offset shifts, no
  transposes inside the kernel;
- the CG coupling constants are compile-time scalars unrolled into VPU
  multiply-adds over ``[mul, TE]`` tiles, exploiting wigner-3j sparsity
  (only nonzero couplings emit code; a dense MXU mapping would pad
  d1*d2 <= 25-sized contractions onto a 128x128 array at <10%%
  utilization AND stream (edge, mul) rows serially -- slower than the
  VPU doing only the real work);
- grid pipelining double-buffers the HBM<->VMEM tile traffic
  automatically (no manual DMA).

The XLA implementations in ``fused_conv`` are the bit-level oracle;
``tests/test_fused_conv_kernel.py`` pins kernel == oracle in interpret
mode on CPU, and the A/B in ``bench.py`` measures both on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_conv import CGLayout, _MODE_LEGS, _MODE_OUT


def _tile_e() -> int:
    return int(os.environ.get('SEVENN_FUSED_CONV_TILE', '128'))


def _emit(layout: CGLayout, mode: str, a_ref, b_ref, c_ref, out_ref):
    """Unroll one mode's contraction over ref slices.

    Helpers below slice ``[mul, TE]`` (or ``[1, TE]``) views; expressions
    are folded in Python so shared (i, j) products trace once.
    """
    def rows(ref, off, n):
        return ref[off:off + n, :]

    if mode == 'msg':
        x_ref, sh_ref, w_ref = a_ref, b_ref, c_ref
    elif mode == 'x':
        g_ref, sh_ref, w_ref = a_ref, b_ref, c_ref
    elif mode == 'sh':
        g_ref, x_ref, w_ref = a_ref, b_ref, c_ref
    elif mode == 'w':
        g_ref, x_ref, sh_ref = a_ref, b_ref, c_ref
    else:
        raise ValueError(mode)

    acc = {}  # out row-offset -> (n_rows, expr) accumulated in python

    def add(off, n, expr):
        if off in acc:
            acc[off] = (n, acc[off][1] + expr)
        else:
            acc[off] = (n, expr)

    for grp in layout.groups:
        mul = grp.mul

        def x_sl(i, _g=grp):
            return rows(x_ref, _g.x_off + i * mul, mul)

        def sh_sl(j, _g=grp):
            return rows(sh_ref, _g.sh_off + j, 1)

        def g_sl(p, k, _m=mul):
            return rows(g_ref, p.msg_off + k * _m, _m)

        def w_sl(p, _m=mul):
            return rows(w_ref, p.w_off, _m)

        if mode == 'msg':
            t = {}
            for p in grp.paths:
                wp = w_sl(p)
                for k in range(p.d_out):
                    expr = None
                    for (kk, i, j, cc) in p.nnz:
                        if kk != k:
                            continue
                        if (i, j) not in t:
                            t[(i, j)] = x_sl(i) * sh_sl(j)
                        term = cc * t[(i, j)]
                        expr = term if expr is None else expr + term
                    if expr is not None:
                        add(p.msg_off + k * mul, mul, expr * wp)
        elif mode == 'x':
            for p in grp.paths:
                wp = w_sl(p)
                gw = {k: g_sl(p, k) * wp for k in
                      sorted({kk for (kk, _, _, _) in p.nnz})}
                for (k, i, j, cc) in p.nnz:
                    add(grp.x_off + i * mul, mul,
                        cc * sh_sl(j) * gw[k])
        elif mode == 'sh':
            # one sublane reduction per (group, j), not per nnz term
            jacc = {}
            for p in grp.paths:
                wp = w_sl(p)
                gw = {k: g_sl(p, k) * wp for k in
                      sorted({kk for (kk, _, _, _) in p.nnz})}
                for (k, i, j, cc) in p.nnz:
                    term = cc * x_sl(i) * gw[k]
                    jacc[j] = term if j not in jacc else jacc[j] + term
            for j, acc_j in jacc.items():
                add(grp.sh_off + j, 1,
                    jnp.sum(acc_j, axis=0, keepdims=True))
        elif mode == 'w':
            t = {}
            for p in grp.paths:
                expr = None
                for (k, i, j, cc) in p.nnz:
                    if (i, j) not in t:
                        t[(i, j)] = x_sl(i) * sh_sl(j)
                    term = cc * t[(i, j)] * g_sl(p, k)
                    expr = term if expr is None else expr + term
                if expr is not None:
                    add(p.w_off, mul, expr)

    # write accumulated rows; zero-fill uncovered output rows
    out_dim = out_ref.shape[0]
    covered = sorted(acc.items())
    pos = 0
    for off, (n, expr) in covered:
        assert off >= pos, 'overlapping output chunks'
        if off > pos:
            out_ref[pos:off, :] = jnp.zeros(
                (off - pos, out_ref.shape[1]), out_ref.dtype)
        out_ref[off:off + n, :] = expr
        pos = off + n
    if pos < out_dim:
        out_ref[pos:out_dim, :] = jnp.zeros(
            (out_dim - pos, out_ref.shape[1]), out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(layout: CGLayout, mode: str, TE: int, n_tiles: int,
                dtype_name: str, interpret: bool):
    dims = layout.mode_dims
    in_dims = [dims[leg] for leg in _MODE_LEGS[mode]]
    out_dim = dims[_MODE_OUT[mode]]
    dtype = jnp.dtype(dtype_name)

    def kernel(a_ref, b_ref, c_ref, out_ref):
        _emit(layout, mode, a_ref, b_ref, c_ref, out_ref)

    flops_per_edge = 3 * sum(
        len(p.nnz) * g.mul for g in layout.groups for p in g.paths
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((d, TE), lambda e: (0, e),
                             memory_space=pltpu.VMEM)
                for d in in_dims
            ],
            out_specs=pl.BlockSpec((out_dim, TE), lambda e: (0, e),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((out_dim, n_tiles * TE), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_edge * n_tiles * TE,
            bytes_accessed=4 * n_tiles * TE * (sum(in_dims) + out_dim),
            transcendentals=0,
        ),
        interpret=interpret,
    )


def pallas_impl(a, b, c, *, layout: CGLayout, mode: str,
                interpret: bool = False):
    """Run one mode as a Pallas kernel; edge axis padded to tile size."""
    E = a.shape[-1]
    TE = _tile_e()
    E_pad = -(-E // TE) * TE
    if E_pad != E:
        pad = ((0, 0), (0, E_pad - E))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
        c = jnp.pad(c, pad)
    call = _build_call(layout, mode, TE, E_pad // TE, str(a.dtype),
                       interpret)
    out = call(a, b, c)
    return out[:, :E] if E_pad != E else out
