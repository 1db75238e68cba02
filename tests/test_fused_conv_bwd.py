"""Gather-fused backward kernels (cg_node xn/shn/wn): interpret-mode
kernel == XLA composition oracle.

The oracle is fused_conv_agg._impl (gather ybar by dst, run the
per-edge feature-major family) -- the path the kernels replace on TPU.
Covers: small + SevenNet-0-block layouts, sentinel (out-of-range dst)
edges, non-tile-multiple edge counts, multi-window node spans, and the
batch-folded layout produced by the vmap batcher.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.fused_conv import layout_from_spec
from sevennet_finetuning_tpu.ops.fused_conv_agg import _impl
from sevennet_finetuning_tpu.ops.fused_conv_bwd_kernel import bwd_pallas
from sevennet_finetuning_tpu.ops.tensor_product import uvu_tp_spec

MODES = ('xn', 'shn', 'wn')


def _spec_small():
    return uvu_tp_spec(Irreps('4x0e+3x1e+2x2e'), Irreps('1x0e+1x1e+1x2e'),
                       Irreps('4x0e+4x1e+4x2e'))


def _spec_sevennet_block():
    # SevenNet-0 interior block: mul 128/64/32 node irreps x lmax-2 SH
    return uvu_tp_spec(
        Irreps('16x0e+8x1e+4x2e'),      # structure-preserving, smaller
        Irreps('1x0e+1x1e+1x2e'),
        Irreps('16x0e+16x1e+16x2e'),
    )


def _data(spec, E, N, seed=0, sentinel_tail=4):
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


def _run_both(layout, mode, ybar, x, sh, w, dst, N):
    a, b, c = _legs(mode, ybar, x, sh, w)
    want = _impl(a, b, c, dst, layout=layout, mode=mode, n_node=N)
    got = bwd_pallas(a, b, c, dst, layout=layout, mode=mode, n_node=N,
                     interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('mode', MODES)
def test_small_layout(mode):
    spec = _spec_small()
    layout, ybar, x, sh, w, dst = _data(spec, E=33, N=9)
    _run_both(layout, mode, ybar, x, sh, w, dst, 9)


@pytest.mark.parametrize('mode', MODES)
def test_sevennet_block_layout(mode):
    spec = _spec_sevennet_block()
    layout, ybar, x, sh, w, dst = _data(spec, E=77, N=12, seed=3)
    _run_both(layout, mode, ybar, x, sh, w, dst, 12)


@pytest.mark.parametrize('mode', MODES)
def test_multi_tile_multi_window(mode, monkeypatch):
    # >1 edge tile and node spans crossing several WB windows
    monkeypatch.setenv('SEVENN_BWD_EDGE_TILE', '128')
    monkeypatch.setenv('SEVENN_BWD_WINDOW', '8')
    spec = _spec_small()
    layout, ybar, x, sh, w, dst = _data(spec, E=300, N=41, seed=5)
    _run_both(layout, mode, ybar, x, sh, w, dst, 41)


@pytest.mark.parametrize('mode', MODES)
def test_all_sentinel(mode):
    # fully-padded call (e.g. an empty ghost partition)
    spec = _spec_small()
    layout, ybar, x, sh, w, dst = _data(spec, E=16, N=5,
                                        sentinel_tail=16)
    _run_both(layout, mode, ybar, x, sh, w, dst, 5)


@pytest.mark.parametrize('mode', MODES)
def test_dead_trailing_tile(mode, monkeypatch):
    # a FULLY-sentinel trailing tile among live ones (the collate pads
    # the edge list to capacity; dead tiles take the round-5 skip path
    # and must still write zeros)
    monkeypatch.setenv('SEVENN_BWD_EDGE_TILE', '128')
    spec = _spec_small()
    layout, ybar, x, sh, w, dst = _data(spec, E=300, N=41, seed=7,
                                        sentinel_tail=170)
    _run_both(layout, mode, ybar, x, sh, w, dst, 41)


def test_batch_folded_layout():
    # the vmap batcher folds B batches with a per-batch sentinel stride
    # of (n_node + 1); the kernel must reproduce the oracle there too
    spec = _spec_small()
    B, E, N = 3, 40, 7
    stride = N + 1
    rng = np.random.default_rng(11)
    layout = layout_from_spec(spec)
    ybar = rng.standard_normal((B, stride, layout.dim_msg))
    ybar[:, N] = 0.0
    sh = rng.standard_normal((B, E, layout.dim_sh))
    w = rng.standard_normal((B, E, layout.dim_w))
    dst = np.sort(rng.integers(0, N, (B, E)), axis=1)
    dst[:, -3:] = N
    dst_f = (dst + np.arange(B)[:, None] * stride).reshape(-1)
    yb_f = jnp.asarray(ybar.reshape(B * stride, -1), jnp.float32)
    sh_f = jnp.asarray(sh.reshape(B * E, -1), jnp.float32)
    w_f = jnp.asarray(w.reshape(B * E, -1), jnp.float32)
    want = _impl(yb_f, sh_f, w_f, jnp.asarray(dst_f), layout=layout,
                 mode='xn', n_node=B * stride)
    got = bwd_pallas(yb_f, sh_f, w_f, jnp.asarray(dst_f), layout=layout,
                     mode='xn', n_node=B * stride, interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
