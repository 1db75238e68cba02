"""Pallas TPU kernel: segment-sum of dst-sorted edge messages to nodes.

The message-passing aggregation ``x[n] = sum_{e: dst[e]=n} msg[e]`` is the
scatter half of the convolution hot op (reference analogue:
sevenn/nn/convolution.py:19-32 ``message_gather``).

History note: rounds 1-3 flip-flopped on XLA-vs-kernel because every
pre-round-3 timing relied on ``block_until_ready``, which does NOT
synchronize on the tunneled runtime (PROFILE.md).  Fetch-forced
measurement settled it: XLA's scatter-add costs ~2 ms in context even
with the sorted hint, the kernel well under 0.5 ms, and the kernel-
routed train step beats the XLA-routed one 138.6 vs 145.9 ms with
bit-identical losses.  The kernel is the TPU default; SEVENN_NO_PALLAS=1
selects the XLA oracle.

The kernel exploits the batching invariant that edges are sorted
by destination (``model.graph.collate`` dst-sorts each graph's edges and
pads with the out-of-range sentinel, preserving ascending order):

- grid over node tiles of ``TN`` rows; a scalar-prefetched ``bounds``
  array gives each node tile its half-open window [lo, hi) of edge tiles
  (computed with two ``searchsorted`` calls -- data-dependent values,
  static shapes);
- each visited edge tile is DMA'd HBM->VMEM and reduced onto the output
  block with a one-hot [TN, TE] x [TE, D] matmul on the MXU -- the classic
  TPU scatter-as-matmul, restricted by sortedness to the ~1-2 node tiles
  an edge tile actually touches.

The backward of a segment-sum is a gather (``g[dst]``), which XLA handles
at full speed, wired via ``jax.custom_vjp``.

Requires ``dst`` sorted ascending.  ``aggregate_messages`` is the
dispatching entry used by ``model.nequip``'s convolution.
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_NODE_TILE = 128
DEFAULT_EDGE_TILE = 256

# trace-time dispatch override: None -> env/default; 'xla' | 'pallas'
_IMPL_OVERRIDE = None


@contextlib.contextmanager
def force_impl(impl):
    """Force the aggregation implementation while tracing under this
    context ('xla' or 'pallas'; None restores default dispatch).  Used
    by the A/B bench to compile both paths in one process."""
    global _IMPL_OVERRIDE
    assert impl in (None, 'xla', 'pallas')
    prev, _IMPL_OVERRIDE = _IMPL_OVERRIDE, impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


def aggregate_messages(
    msg: jnp.ndarray,
    dst: jnp.ndarray,
    n_node: int,
    sorted_dst: bool,
) -> jnp.ndarray:
    """Message aggregation ``x[n] = sum_{e: dst[e]=n} msg[e]`` -- the
    scatter half of the convolution hot op.

    Default on TPU with sorted dst: the Pallas sorted-segment-sum kernel.
    Honest (fetch-forced, see PROFILE.md) round-3 measurement: XLA's
    scatter-add costs ~5.7 ms for a [21504, 1152] -> [512] aggregation
    even with the ``indices_are_sorted`` hint (~0.3 ms of HBM traffic),
    serializing the convolution; the kernel does it in well under 0.5 ms.
    SEVENN_NO_PALLAS=1 forces the XLA path (correctness oracle);
    unsorted callers (halo ghost edges) always use XLA scatter-add.
    """
    return _bind_seg(msg, dst, dst, mode='scatter', n_rows=n_node,
                     sorted_idx=sorted_dst, has_perm=False,
                     zero_oob=False)


def scatter_rows(
    values: jnp.ndarray,
    idx: jnp.ndarray,
    n_rows: int,
    perm: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scatter-add ``out[idx[e]] += values[e]`` for UNSORTED ``idx``
    given a static permutation ``perm`` with ``idx[perm]`` ascending
    (collate ships one for the source index, K.EDGE_SRC_PERM): the
    values are permuted (one cheap gather) and summed by the sorted
    kernel instead of XLA's serial scatter-add."""
    if perm is None:
        return jax.ops.segment_sum(values, idx, num_segments=n_rows)
    return _bind_seg(values, idx, perm, mode='scatter', n_rows=n_rows,
                     sorted_idx=False, has_perm=True, zero_oob=False)


def gather_rows(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x[idx]`` whose AD transpose (scatter-add of cotangents by
    ``idx``) rides the sorted kernel via ``perm`` (static, idx[perm]
    ascending).  Without a perm this is a plain gather.

    Sentinel semantics (with perm): out-of-range idx rows (padded edges)
    clamp in the forward like a plain gather; the transpose DROPS their
    cotangents instead of accumulating into the clamped last row --
    IDENTICAL in both the kernel and XLA implementations, so a caller
    violating the zero-cotangent precondition diverges from ``x[idx]``
    everywhere and is caught by any oracle comparison (ADVICE r3 low).
    Dropping is exact for every caller in this repo because the radial
    embedding EDGE_MASK zeroes padded messages and their gradients.
    """
    if perm is None:
        return x[idx]
    return _bind_seg(x, idx, perm, mode='gather', n_rows=x.shape[0],
                     sorted_idx=False, has_perm=True, zero_oob=False)


def _kernel(TN: int, TE: int, precision,
            bounds_ref, dst_ref, msg_ref, out_ref, dst_buf, msg_buf,
            sem_d, sem_m):
    """Double-buffered: tile et+1's HBM->VMEM DMAs are issued before the
    matmul on tile et, hiding the copy behind the MXU work (slot = et%2).
    """
    nt = pl.program_id(0)
    lo = bounds_ref[nt, 0]
    hi = bounds_ref[nt, 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0) + nt * TN
    )

    def start_copy(et, slot):
        pltpu.make_async_copy(
            dst_ref.at[et], dst_buf.at[slot], sem_d.at[slot]).start()
        pltpu.make_async_copy(
            msg_ref.at[et], msg_buf.at[slot], sem_m.at[slot]).start()

    def wait_copy(et, slot):
        pltpu.make_async_copy(
            dst_ref.at[et], dst_buf.at[slot], sem_d.at[slot]).wait()
        pltpu.make_async_copy(
            msg_ref.at[et], msg_buf.at[slot], sem_m.at[slot]).wait()

    @pl.when(lo < hi)
    def _():
        start_copy(lo, lo % 2)

    def body(et, carry):
        slot = et % 2

        @pl.when(et + 1 < hi)
        def _():
            start_copy(et + 1, (et + 1) % 2)

        wait_copy(et, slot)
        # the one-hot is EXACT in bf16, so only msg's f32 mantissa needs
        # recovering; `precision` picks the tradeoff per MXU pass count:
        #   'bf16x2'  hi/lo split, 2 single-pass dots (~2^-18 rel. err)
        #   'highest' lax HIGHEST (bf16x6 emulated f32, 3x the cost)
        #   'bf16'    1 pass (~2^-9 rel. err -- bench only)
        oh = (row_ids == dst_buf[slot])
        m = msg_buf[slot]
        if precision == 'highest':
            # exact 3-way bf16 split: the one-hot is exact in bf16 and
            # 3 x 8 mantissa bits reproduce the full f32 mantissa, so
            # three single-pass dots equal the six-pass HIGHEST
            # emulation at half the MXU cost
            ohb = oh.astype(jnp.bfloat16)
            m_hi = m.astype(jnp.bfloat16)
            r1 = m - m_hi.astype(jnp.float32)
            m_mid = r1.astype(jnp.bfloat16)
            m_lo = (r1 - m_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[:] += (
                jax.lax.dot(ohb, m_hi, preferred_element_type=jnp.float32)
                + jax.lax.dot(ohb, m_mid,
                              preferred_element_type=jnp.float32)
                + jax.lax.dot(ohb, m_lo,
                              preferred_element_type=jnp.float32)
            ).astype(out_ref.dtype)
        elif precision == 'bf16':
            out_ref[:] += jax.lax.dot(
                oh.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
        else:  # bf16x2
            ohb = oh.astype(jnp.bfloat16)
            m_hi = m.astype(jnp.bfloat16)
            m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[:] += (
                jax.lax.dot(ohb, m_hi, preferred_element_type=jnp.float32)
                + jax.lax.dot(ohb, m_lo, preferred_element_type=jnp.float32)
            ).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(lo, hi, body, 0)


def _tile_bounds(dst: jnp.ndarray, num_node_tiles: int,
                 TN: int, TE: int) -> jnp.ndarray:
    """Per-node-tile half-open [lo, hi) window of edge-tile indices."""
    starts = jnp.arange(num_node_tiles, dtype=dst.dtype) * TN
    first = jnp.searchsorted(dst, starts, side='left').astype(jnp.int32)
    last = jnp.searchsorted(dst, starts + TN, side='left').astype(jnp.int32)
    lo = first // TE
    hi = jnp.where(last > first, (last + TE - 1) // TE, lo)
    return jnp.stack([lo, hi], axis=1)


def _default_precision():
    """Matmul mode for the one-hot reduce; override with
    SEVENN_SCATTER_PRECISION=highest|bf16x2|bf16.

    Default 'highest' (lax HIGHEST, exact-f32): every aggregation in the
    model rides this kernel (messages, total energy, forces, virial), the
    'bit-identical losses' A/B validation and the 1e-5 reference-parity
    bar (ops/precision.py) were both established under the exact path,
    and ~2 extra MXU passes on the one-hot reduce are noise next to the
    TP chain (ADVICE r3 medium: bf16x2-by-default silently changed the
    validated numerics).  Benchmarks may opt into 'bf16x2' (~2^-18
    relative error, two single-pass dots) explicitly."""
    name = os.environ.get('SEVENN_SCATTER_PRECISION', 'highest').lower()
    assert name in ('bf16x2', 'highest', 'bf16'), name
    return name


def segment_sum_sorted(
    msg: jnp.ndarray,
    dst: jnp.ndarray,
    n_node: int,
    node_tile: int = DEFAULT_NODE_TILE,
    edge_tile: int = DEFAULT_EDGE_TILE,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """``jax.ops.segment_sum(msg, dst, n_node)`` for dst sorted ascending.

    msg: [E, D] float; dst: [E] int32 sorted ascending (out-of-range
    values >= n_node are dropped, so padded edges may carry dst=n_node).
    Returns [n_node, D].

    Differentiable to arbitrary order: the op is linear in ``msg``, so it
    is registered with ``linear_call`` -- JVP applies the op to tangents
    and transposition swaps scatter<->gather, closing the pair under any
    composition of forward/reverse AD (the training loss needs
    grad-of-grad: forces are themselves gradients).
    """
    return _bind_seg(msg, dst, dst, mode='scatter', n_rows=n_node,
                     sorted_idx=True, has_perm=False, zero_oob=False,
                     node_tile=node_tile, edge_tile=edge_tile,
                     interpret=interpret, precision=precision)


# ---------------------------------------------------------------------------
# the scatter/gather adjoint pair as one primitive
# ---------------------------------------------------------------------------
#
# modes ('values' is the only differentiable argument; 'idx' addresses
# rows; 'perm' statically sorts idx for kernel routing, ignored unless
# has_perm):
#
#   'scatter': values [E, D], idx [E] -> out [n_rows, D]
#              out[n] = sum_{e: idx[e] == n} values[e]; idx >= n_rows
#              dropped.  Kernel-routed when sorted_idx (directly) or
#              has_perm (via values[perm]).
#   'gather' : values [n_rows, D], idx [E] -> out [E, D]
#              out[e] = values[min(idx[e], n_rows-1)]; zero_oob=True
#              reads 0 for idx >= n_rows instead (the exact adjoint of
#              the scatter's drop semantics).
#
# transpose(scatter) = gather(zero_oob=True); transpose(gather) =
# scatter -- exact for zero_oob, and for the clamp forward it relies on
# the documented zero-cotangent invariant for out-of-range rows.
# Registered as a primitive (not linear_call) so it also has a BATCHING
# rule: the DP trainer vmaps the model over the shard axis, and
# linear_call has no batching support.

from jax._src import core as _jcore
from jax._src import dispatch as _jdispatch
from jax.extend.core import Primitive as _Primitive
from jax.interpreters import ad as _ad
from jax.interpreters import batching as _batching
from jax.interpreters import mlir as _mlir

seg_rows_p = _Primitive('sevenn_seg_rows')

# trace-time interpreter override so CPU tests can exercise the kernel
# (set directly by tests; composes with force_impl('pallas'))
_INTERPRET_OVERRIDE = False


def _bind_seg(values, idx, perm, *, mode, n_rows, sorted_idx, has_perm,
              zero_oob, node_tile=DEFAULT_NODE_TILE,
              edge_tile=DEFAULT_EDGE_TILE, interpret=False,
              precision=None):
    assert values.ndim == 2, values.shape
    # dynamic overrides are resolved INTO the primitive params here so
    # (a) the eager dispatch cache is keyed on them and (b) transposed /
    # batched binds inherit the configuration they were traced under
    values, idx, perm = _jcore.standard_insert_pvary(values, idx, perm)
    return seg_rows_p.bind(
        values, idx, perm, mode=mode, n_rows=int(n_rows),
        sorted_idx=bool(sorted_idx), has_perm=bool(has_perm),
        zero_oob=bool(zero_oob), node_tile=node_tile,
        edge_tile=edge_tile,
        interpret=bool(interpret or _INTERPRET_OVERRIDE),
        precision=precision, impl=_IMPL_OVERRIDE,
    )


def _bind_raw(values, idx, perm, **params):
    values, idx, perm = _jcore.standard_insert_pvary(values, idx, perm)
    return seg_rows_p.bind(values, idx, perm, **params)


def _seg_abstract(values, idx, perm, *, mode, n_rows, **_):
    if mode == 'scatter':
        shape = (n_rows, values.shape[1])
    else:
        shape = (idx.shape[0], values.shape[1])
    # propagate shard_map varying-manual-axes info (see fused_conv.py:
    # claiming replicated outputs makes shard_map transposes over-psum)
    vma = _jcore.standard_vma_rule('sevenn_seg_rows', values, idx, perm)
    return values.update(shape=shape, vma=vma)


seg_rows_p.def_abstract_eval(_seg_abstract)


def _kernel_enabled(sorted_idx, has_perm, interpret, impl):
    if not (sorted_idx or has_perm):
        return False
    if interpret:
        return True
    if impl is not None:
        return impl == 'pallas'
    return (jax.default_backend() == 'tpu'
            and not os.environ.get('SEVENN_NO_PALLAS'))


def _seg_impl(values, idx, perm, *, mode, n_rows, sorted_idx, has_perm,
              zero_oob, node_tile, edge_tile, interpret, precision,
              impl):
    if mode == 'scatter':
        if _kernel_enabled(sorted_idx, has_perm, interpret, impl):
            prec = precision or _default_precision()
            if sorted_idx:
                return _forward(values, idx, n_rows, node_tile,
                                edge_tile, interpret, prec)
            return _forward(values[perm], idx[perm], n_rows, node_tile,
                            edge_tile, interpret, prec)
        # XLA oracle: segment_sum drops out-of-range indices, matching
        # the kernel's sentinel semantics exactly
        return jax.ops.segment_sum(
            values, idx, num_segments=n_rows,
            indices_are_sorted=sorted_idx,
        )
    # gather: XLA is already fast; kernel routing only matters for the
    # scatter side
    safe = jnp.minimum(idx, n_rows - 1)
    out = values[safe]
    if zero_oob:
        out = jnp.where((idx < n_rows)[:, None], out, 0.0)
    return out


seg_rows_p.def_impl(
    functools.partial(_jdispatch.apply_primitive, seg_rows_p))
_mlir.register_lowering(
    seg_rows_p, _mlir.lower_fun(_seg_impl, multiple_results=False))


def _seg_jvp(primals, tangents, **params):
    values, idx, perm = primals
    out = _bind_raw(values, idx, perm, **params)
    dv = tangents[0]
    if isinstance(dv, _ad.Zero):
        return out, _ad.Zero.from_primal_value(out)
    return out, _bind_raw(dv, idx, perm, **params)


_ad.primitive_jvps[seg_rows_p] = _seg_jvp


def _seg_transpose(ct, values, idx, perm, *, mode, n_rows, sorted_idx,
                   has_perm, zero_oob, node_tile, edge_tile, interpret,
                   precision, impl):
    assert isinstance(values, _ad.UndefinedPrimal)
    if isinstance(ct, _ad.Zero):
        return _ad.Zero(values.aval), None, None
    common = dict(n_rows=n_rows, sorted_idx=sorted_idx,
                  has_perm=has_perm, node_tile=node_tile,
                  edge_tile=edge_tile, interpret=interpret,
                  precision=precision, impl=impl)
    if mode == 'scatter':
        dv = _bind_raw(ct, idx, perm, mode='gather',
                       zero_oob=True, **common)
    else:
        if os.environ.get('SEVENN_DEBUG_COTANGENT'):
            # debug-mode assertion of the zero-cotangent invariant
            # (gather_rows docstring): cotangents on out-of-range rows
            # are DROPPED by the scatter below; every caller must
            # guarantee they are zero (EDGE_MASK zeroes the radial
            # embedding of padded edges).  Env-gated -- production
            # traces carry no callback.
            def _check_dropped_zero(max_abs):
                if float(max_abs) > 0.0:
                    raise FloatingPointError(
                        'gather_rows transpose: nonzero cotangent '
                        f'(max |ct| = {float(max_abs):g}) on an '
                        'out-of-range row would be silently dropped; '
                        'the zero-cotangent precondition is violated'
                    )

            dropped = jnp.where((idx >= n_rows)[:, None],
                                jnp.abs(ct), 0.0)
            jax.debug.callback(_check_dropped_zero, jnp.max(dropped))
        dv = _bind_raw(ct, idx, perm, mode='scatter',
                       zero_oob=False, **common)
    return dv, None, None


_ad.primitive_transposes[seg_rows_p] = _seg_transpose


def _seg_batcher(args, dims, *, mode, n_rows, sorted_idx, has_perm,
                 zero_oob, node_tile, edge_tile, interpret, precision,
                 impl):
    """Fold the batch axis into the row axis with a per-batch stride of
    ``n_rows + 1``: row ``n_rows`` of every batch slot is the drop/zero
    sentinel, so sortedness, drop semantics, and the perm routing all
    survive batching (and therefore so do the kernels)."""
    values, idx, perm = args
    dv, di, dp = dims
    B = next(v.shape[d] for v, d in zip(args, dims)
             if d is not _batching.not_mapped)

    def front(v, d):
        if d is _batching.not_mapped:
            return jnp.broadcast_to(v[None], (B,) + v.shape)
        return jnp.moveaxis(v, d, 0)

    values = front(values, dv)                 # [B, R, D]
    idx = front(idx, di)                       # [B, E]
    perm = front(perm, dp)                     # [B, E]
    E = idx.shape[1]
    boff = jnp.arange(B, dtype=idx.dtype)[:, None]
    stride = n_rows + 1
    idx_f = (jnp.minimum(idx, n_rows) + boff * stride).reshape(-1)
    perm_f = (perm + boff * E).reshape(-1)

    common = dict(sorted_idx=sorted_idx, has_perm=has_perm,
                  node_tile=node_tile, edge_tile=edge_tile,
                  interpret=interpret, precision=precision, impl=impl)
    if mode == 'scatter':
        vals_f = values.reshape(B * values.shape[1], values.shape[2])
        out = _bind_raw(
            vals_f, idx_f, perm_f, mode='scatter', n_rows=B * stride,
            zero_oob=zero_oob, **common,
        )
        out = out.reshape(B, stride, -1)[:, :n_rows]
        return out, 0
    # gather: append the per-batch sentinel row (zeros); the clamp
    # forward re-clamps to n_rows - 1 per batch first
    if not zero_oob:
        idx_f = (jnp.minimum(idx, n_rows - 1) + boff * stride).reshape(-1)
    vals_p = jnp.pad(values, ((0, 0), (0, 1), (0, 0)))
    vals_f = vals_p.reshape(B * stride, values.shape[2])
    out = _bind_raw(
        vals_f, idx_f, perm_f, mode='gather', n_rows=B * stride,
        zero_oob=zero_oob, **common,
    )
    return out.reshape(B, E, -1), 0


_batching.primitive_batchers[seg_rows_p] = _seg_batcher


def _forward(msg, dst, n_node, TN, TE, interpret, precision):
    E, D = msg.shape
    msg_D = D
    assert dst.shape == (E,)
    E_pad = -(-E // TE) * TE
    N_pad = -(-n_node // TN) * TN
    D_pad = -(-D // 128) * 128  # mosaic HBM slices need lane alignment
    if E_pad != E or D_pad != D:
        # pad msg with zero rows/cols and dst past every node tile;
        # sortedness is preserved because N_pad > any real destination
        msg = jnp.pad(msg, ((0, E_pad - E), (0, D_pad - D)))
        dst = jnp.pad(dst, (0, E_pad - E), constant_values=N_pad)
    dst = jnp.minimum(dst, N_pad)  # clamp out-of-range, keeps sortedness
    D = D_pad

    n_et = E_pad // TE
    NT = N_pad // TN
    bounds = _tile_bounds(dst, NT, TN, TE)

    out = pl.pallas_call(
        functools.partial(_kernel, TN, TE, precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (TN, D), lambda nt, bounds: (nt, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 1, TE), jnp.int32),
                pltpu.VMEM((2, TE, D), msg.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, D), msg.dtype),
        interpret=interpret,
    )(bounds, dst.reshape(n_et, 1, TE), msg.reshape(n_et, TE, D))
    return out[:n_node, :msg_D]


