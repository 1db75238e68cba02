"""Pallas TPU kernel: segment-sum of dst-sorted edge messages to nodes.

The message-passing aggregation ``x[n] = sum_{e: dst[e]=n} msg[e]`` is the
scatter half of the convolution hot op (reference analogue:
sevenn/nn/convolution.py:19-32 ``message_gather``).  XLA lowers
``jax.ops.segment_sum`` to a general scatter-add; on TPU that emitter
serializes on duplicate indices and runs far below HBM speed (measured
~2 ms for a [21504, 1152] -> [512, 1152] aggregation on v5e that is
~0.25 ms of pure HBM traffic).

This kernel instead exploits the batching invariant that edges are sorted
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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_NODE_TILE = 128
DEFAULT_EDGE_TILE = 256


def aggregate_messages(
    msg: jnp.ndarray,
    dst: jnp.ndarray,
    n_node: int,
    sorted_dst: bool,
) -> jnp.ndarray:
    """Message aggregation ``x[n] = sum_{e: dst[e]=n} msg[e]`` -- the
    scatter half of the convolution hot op.

    Batches from ``model.graph.collate`` guarantee dst-sorted edges
    (sorted_dst=True): on TPU those route to the Pallas sorted-segment-sum
    kernel (SEVENN_NO_PALLAS=1 forces the XLA path, the correctness
    oracle); elsewhere XLA's scatter-add with the ``indices_are_sorted``
    hint.  Unsorted callers (e.g. the halo path's ghost-slot edges) get
    the plain scatter-add.
    """
    if (
        sorted_dst
        and jax.default_backend() == 'tpu'
        and not os.environ.get('SEVENN_NO_PALLAS')
    ):
        return segment_sum_sorted(msg, dst, n_node)
    return jax.ops.segment_sum(
        msg, dst, num_segments=n_node, indices_are_sorted=sorted_dst
    )


def _kernel(TN: int, TE: int,
            bounds_ref, dst_ref, msg_ref, out_ref, dst_buf, msg_buf,
            sem_d, sem_m):
    nt = pl.program_id(0)
    lo = bounds_ref[nt, 0]
    hi = bounds_ref[nt, 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0) + nt * TN
    )

    def body(et, carry):
        cd = pltpu.make_async_copy(dst_ref.at[et], dst_buf, sem_d)
        cm = pltpu.make_async_copy(msg_ref.at[et], msg_buf, sem_m)
        cd.start()
        cm.start()
        cd.wait()
        cm.wait()
        onehot = (row_ids == dst_buf[:]).astype(msg_buf.dtype)
        # HIGHEST: the MXU's default bf16 rounding of msg costs ~4e-3
        # relative error, far above f32 accumulation noise
        out_ref[:] += jax.lax.dot(
            onehot, msg_buf[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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


def segment_sum_sorted(
    msg: jnp.ndarray,
    dst: jnp.ndarray,
    n_node: int,
    node_tile: int = DEFAULT_NODE_TILE,
    edge_tile: int = DEFAULT_EDGE_TILE,
    interpret: bool = False,
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
    return _seg_sum(msg, dst, n_node, node_tile, edge_tile, interpret)


def _seg_sum(msg, dst, n_node, TN, TE, interpret):
    def scatter(dst_res, m):
        return _forward(m, dst_res, n_node, TN, TE, interpret)

    def gather(dst_res, g):
        # adjoint: rows past n_node (padded edges) read zero; XLA
        # handles the gather at full speed
        safe = jnp.minimum(dst_res, n_node - 1)
        return jnp.where((dst_res < n_node)[:, None], g[safe], 0.0)

    return jax.custom_derivatives.linear_call(scatter, gather, dst, msg)


def _forward(msg, dst, n_node, TN, TE, interpret):
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
        functools.partial(_kernel, TN, TE),
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
                pltpu.VMEM((1, TE), jnp.int32),
                pltpu.VMEM((TE, D), msg.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, D), msg.dtype),
        interpret=interpret,
    )(bounds, dst.reshape(n_et, 1, TE), msg.reshape(n_et, TE, D))
    return out[:n_node, :msg_D]


