"""Pallas kernel for the scatter-fused convolution ('agg' mode).

Structure = the sorted-segment-sum kernel of ``ops.pallas_scatter``
(node-tile grid, scalar-prefetched per-tile edge windows, double-
buffered manual DMA, one-hot MXU reduce) with the message COMPUTATION
moved inside: each visited edge tile DMAs the edge-major x/sh/w slabs
(contiguous HBM regions), evaluates the unrolled wigner-3j-sparse
contraction in VMEM, and reduces the resulting [TE, dim_msg] messages
onto the output node block -- the [E, dim_msg] message tensor never
exists in HBM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_conv import CGLayout


def _tiles():
    TN = int(os.environ.get('SEVENN_AGG_NODE_TILE', '64'))
    TE = int(os.environ.get('SEVENN_AGG_EDGE_TILE', '256'))
    return TN, TE


def _use_fm() -> bool:
    """Feature-major in-kernel message compute (round 5): transpose the
    edge slabs in VMEM and run the sublane-sliced contraction -- the
    round-4 edge-major compute pays lane-offset operand shifts at mul
    32/64 (see fused_conv_bwd_kernel).  The scatter matmul keeps the
    identical K=TE contraction over identical values, so the aggregated
    sums stay BITWISE equal to the edge-major path and to the round-3
    chain's sorted-scatter kernel (the bench A/B invariant)."""
    return os.environ.get('SEVENN_AGG_FM', '1') != '0'


def _msg_value(layout: CGLayout, x, sh, w):
    """Edge-major messages [TE, dim_msg] as a VMEM value (the in-kernel
    contraction; python-folded so shared (i, j) products trace once)."""
    chunks = []  # (offset, [TE, d_out * mul]) in layout order
    for grp in layout.groups:
        mul = grp.mul
        t = {}
        for p in grp.paths:
            wp = w[:, p.w_off:p.w_off + mul]
            outs_k = []
            for k in range(p.d_out):
                expr = None
                for (kk, i, j, cc) in p.nnz:
                    if kk != k:
                        continue
                    if (i, j) not in t:
                        xs = x[:, grp.x_off + i * mul:
                               grp.x_off + (i + 1) * mul]
                        t[(i, j)] = xs * sh[:, grp.sh_off + j:
                                            grp.sh_off + j + 1]
                    term = cc * t[(i, j)]
                    expr = term if expr is None else expr + term
                outs_k.append(
                    expr * wp if expr is not None
                    else jnp.zeros_like(wp))
            chunks.append((p.msg_off, jnp.concatenate(outs_k, axis=1)))
    chunks.sort(key=lambda kv: kv[0])
    parts = []
    pos = 0
    for off, arr in chunks:
        assert off == pos, 'msg chunks must tile the layout contiguously'
        parts.append(arr)
        pos = off + arr.shape[1]
    assert pos == layout.dim_msg
    return jnp.concatenate(parts, axis=1)


def _kernel(TN, TE, layout, bounds_ref, dst_ref, x_ref, sh_ref, w_ref,
            out_ref, dst_buf, x_buf, sh_buf, w_buf, sem_d, sem_x,
            sem_s, sem_w):
    nt = pl.program_id(0)
    lo = bounds_ref[nt, 0]
    hi = bounds_ref[nt, 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0) + nt * TN
    )

    def copies(et, slot):
        return [
            pltpu.make_async_copy(dst_ref.at[et], dst_buf.at[slot],
                                  sem_d.at[slot]),
            pltpu.make_async_copy(x_ref.at[et], x_buf.at[slot],
                                  sem_x.at[slot]),
            pltpu.make_async_copy(sh_ref.at[et], sh_buf.at[slot],
                                  sem_s.at[slot]),
            pltpu.make_async_copy(w_ref.at[et], w_buf.at[slot],
                                  sem_w.at[slot]),
        ]

    @pl.when(lo < hi)
    def _():
        for c in copies(lo, lo % 2):
            c.start()

    def body(et, carry):
        slot = et % 2

        @pl.when(et + 1 < hi)
        def _():
            for c in copies(et + 1, (et + 1) % 2):
                c.start()

        for c in copies(et, slot):
            c.wait()

        oh = (row_ids == dst_buf[slot])
        if _use_fm():
            from .fused_conv_bwd_kernel import _emit_value

            msg_T = _emit_value(
                layout, 'msg', None, x_buf[slot][:].T,
                sh_buf[slot][:].T, w_buf[slot][:].T,
                layout.dim_msg, TE)
            # same K=TE contraction over the same values as the
            # edge-major path -> bitwise-identical aggregated sums
            out_ref[:] += jax.lax.dot_general(
                oh.astype(jnp.float32), msg_T,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(out_ref.dtype)
            return carry
        msg = _msg_value(layout, x_buf[slot], sh_buf[slot], w_buf[slot])
        # exact f32 one-hot reduce (a bf16x3 split halves the MXU passes
        # but its temporaries tip the kernel over the 16 MB VMEM limit
        # at this tile size; measured net-neutral at smaller tiles)
        out_ref[:] += jax.lax.dot(
            oh.astype(msg.dtype), msg,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(lo, hi, body, 0)


def _tile_bounds(dst, num_node_tiles, TN, TE):
    starts = jnp.arange(num_node_tiles, dtype=dst.dtype) * TN
    first = jnp.searchsorted(dst, starts, side='left').astype(jnp.int32)
    last = jnp.searchsorted(dst, starts + TN,
                            side='left').astype(jnp.int32)
    lo = first // TE
    hi = jnp.where(last > first, (last + TE - 1) // TE, lo)
    return jnp.stack([lo, hi], axis=1)


def _pad128(d):
    return -(-d // 128) * 128


def _col_pad(d):
    """Manual-DMA edge legs MUST be lane-padded: Mosaic rejects
    memref_slice minor dims not aligned to the (1,128) tiling
    ("Slice shape along dimension 2 must be aligned to tiling"),
    measured on-chip in round 5 -- unlike the backward kernels'
    BlockSpec-fed legs, which accept arbitrary minor dims."""
    return _pad128(d)


def agg_pallas(x, sh, w, dst, *, layout: CGLayout, n_node: int,
               interpret: bool = False):
    """Fused messages + sorted segment sum -> [n_node, dim_msg]."""
    E = dst.shape[0]
    TN, TE = _tiles()
    E_pad = -(-E // TE) * TE
    N_pad = -(-n_node // TN) * TN
    x = jnp.pad(x, ((0, E_pad - E), (0, _col_pad(x.shape[1]) - x.shape[1])))
    sh = jnp.pad(sh, ((0, E_pad - E),
                      (0, _col_pad(sh.shape[1]) - sh.shape[1])))
    w = jnp.pad(w, ((0, E_pad - E),
                    (0, _col_pad(w.shape[1]) - w.shape[1])))
    if E_pad != E:
        dst = jnp.pad(dst, (0, E_pad - E), constant_values=N_pad)
    dst = jnp.minimum(dst, N_pad)
    n_et = E_pad // TE
    NT = N_pad // TN
    bounds = _tile_bounds(dst, NT, TN, TE)
    D = layout.dim_msg
    dt = x.dtype

    out = pl.pallas_call(
        functools.partial(_kernel, TN, TE, layout),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # dst tiles
                pl.BlockSpec(memory_space=pltpu.HBM),  # x tiles
                pl.BlockSpec(memory_space=pltpu.HBM),  # sh tiles
                pl.BlockSpec(memory_space=pltpu.HBM),  # w tiles
            ],
            out_specs=pl.BlockSpec(
                (TN, D), lambda nt, bounds: (nt, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 1, TE), jnp.int32),
                pltpu.VMEM((2, TE, _col_pad(layout.dim_x)), dt),
                pltpu.VMEM((2, TE, _col_pad(layout.dim_sh)), dt),
                pltpu.VMEM((2, TE, _col_pad(layout.dim_w)), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, D), dt),
        interpret=interpret,
    )(bounds, dst.reshape(n_et, 1, TE), x.reshape(n_et, TE, -1),
      sh.reshape(n_et, TE, -1), w.reshape(n_et, TE, -1))
    return out[:n_node]


# ---------------------------------------------------------------------------
# GROUPED scatter-fused convolution: several agg terms over one shared
# dst, each term a (x, sh, w) triple drawn from an array pool -- the
# ybar cotangent of a joint backward tangent is agg(ct_x, sh, w) +
# agg(x, ct_sh, w) + agg(x, sh, ct_w) (see ops/fused_conv_multi), three
# kernels re-streaming overlapping slabs.  One kernel shares the pool
# DMA and the visit loop; each term keeps its OWN f32 accumulator and
# the final output combines them left-associatively in term order, so
# the result is bitwise-identical to the separate kernels + XLA adds.
# ---------------------------------------------------------------------------


def _gagg_kernel(TN, TE, layout, terms, n_pool, bounds_ref, dst_ref,
                 *rest):
    pool_refs = rest[:n_pool]
    out_ref = rest[n_pool]
    accs = rest[n_pool + 1:n_pool + 1 + len(terms)]
    bufs = rest[n_pool + 1 + len(terms):n_pool + 1 + len(terms)
                + 1 + n_pool]
    dst_buf, pool_bufs = bufs[0], bufs[1:]
    sems = rest[n_pool + 1 + len(terms) + 1 + n_pool:]
    sem_d, pool_sems = sems[0], sems[1:]

    nt = pl.program_id(0)
    lo = bounds_ref[nt, 0]
    hi = bounds_ref[nt, 1]
    for a in accs:
        a[:] = jnp.zeros_like(a)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0) + nt * TN
    )

    def copies(et, slot):
        cs = [pltpu.make_async_copy(dst_ref.at[et], dst_buf.at[slot],
                                    sem_d.at[slot])]
        for p_ref, p_buf, p_sem in zip(pool_refs, pool_bufs, pool_sems):
            cs.append(pltpu.make_async_copy(
                p_ref.at[et], p_buf.at[slot], p_sem.at[slot]))
        return cs

    @pl.when(lo < hi)
    def _():
        for c in copies(lo, lo % 2):
            c.start()

    def body(et, carry):
        slot = et % 2

        @pl.when(et + 1 < hi)
        def _():
            for c in copies(et + 1, (et + 1) % 2):
                c.start()

        for c in copies(et, slot):
            c.wait()

        oh = (row_ids == dst_buf[slot])
        from .fused_conv_bwd_kernel import _emit_value

        for acc, (xi, si, wi) in zip(accs, terms):
            msg_T = _emit_value(
                layout, 'msg', None, pool_bufs[xi][slot][:].T,
                pool_bufs[si][slot][:].T, pool_bufs[wi][slot][:].T,
                layout.dim_msg, TE)
            acc[:] += jax.lax.dot_general(
                oh.astype(jnp.float32), msg_T,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(acc.dtype)
        return carry

    jax.lax.fori_loop(lo, hi, body, 0)
    total = accs[0][:]
    for a in accs[1:]:
        total = total + a[:]
    out_ref[:] = total


def gagg_pallas(pool, dst, *, layout: CGLayout, terms, n_node: int,
                interpret: bool = False):
    """Sum of agg terms -> [n_node, dim_msg].  ``pool``: edge-major
    arrays; ``terms``: tuple of (x_idx, sh_idx, w_idx) pool indices,
    combined left-associatively in order."""
    E = dst.shape[0]
    TN, TE = _tiles()
    # grouped accumulators + one slab pair per pool entry: halve the
    # edge tile to stay inside VMEM at SevenNet-0 dims
    TE = min(TE, int(os.environ.get('SEVENN_GAGG_EDGE_TILE', '128')))
    E_pad = -(-E // TE) * TE
    N_pad = -(-n_node // TN) * TN
    pool = [jnp.pad(p, ((0, E_pad - E),
                        (0, _col_pad(p.shape[1]) - p.shape[1])))
            for p in pool]
    if E_pad != E:
        dst = jnp.pad(dst, (0, E_pad - E), constant_values=N_pad)
    dst = jnp.minimum(dst, N_pad)
    n_et = E_pad // TE
    NT = N_pad // TN
    bounds = _tile_bounds(dst, NT, TN, TE)
    D = layout.dim_msg
    dt = pool[0].dtype

    out = pl.pallas_call(
        functools.partial(_gagg_kernel, TN, TE, layout, tuple(terms),
                          len(pool)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
            * (1 + len(pool)),
            out_specs=pl.BlockSpec(
                (TN, D), lambda nt, bounds: (nt, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=(
                [pltpu.VMEM((TN, D), jnp.float32)] * len(terms)
                + [pltpu.VMEM((2, 1, TE), jnp.int32)]
                + [pltpu.VMEM((2, TE, _col_pad(p.shape[1])), dt)
                   for p in pool]
                + [pltpu.SemaphoreType.DMA((2,))] * (1 + len(pool))
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, D), dt),
        interpret=interpret,
    )(bounds, dst.reshape(n_et, 1, TE),
      *[p.reshape(n_et, TE, -1) for p in pool])
    return out[:n_node]
