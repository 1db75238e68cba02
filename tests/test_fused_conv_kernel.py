"""Pallas fused-conv kernels == XLA oracle (interpret mode on CPU).

All four AD modes, on (a) the real SevenNet-0 block-1 shapes (dim_x 480,
15 uvu paths, mul 128/64/32) and (b) an odd-parity lmax-1 spec, with a
non-tile-multiple edge count to exercise the pad/slice path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.fused_conv import (
    _MODE_LEGS,
    _xla_impl,
    layout_from_spec,
)
from sevennet_finetuning_tpu.ops.fused_conv_kernel import pallas_impl
from sevennet_finetuning_tpu.ops.tensor_product import uvu_tp_spec


SPECS = {
    'sevennet0_block1': uvu_tp_spec(
        Irreps('128x0e+64x1e+32x2e'),
        Irreps('1x0e+1x1e+1x2e'),
        Irreps('128x0e+128x1e+128x2e'),
    ),
    'parity_lmax1': uvu_tp_spec(
        Irreps('8x0e+4x1o'),
        Irreps('1x0e+1x1o'),
        Irreps('8x0e+8x1o+8x1e'),
    ),
}


@pytest.mark.parametrize('spec_name', sorted(SPECS))
@pytest.mark.parametrize('mode', ['msg', 'x', 'sh', 'w'])
def test_kernel_matches_xla_oracle(spec_name, mode):
    spec = SPECS[spec_name]
    layout = layout_from_spec(spec)
    E = 150  # not a tile multiple
    rng = np.random.default_rng(hash((spec_name, mode)) % 2**31)
    dims = layout.mode_dims
    args = [
        jnp.asarray(rng.standard_normal((dims[leg], E)), jnp.float32)
        for leg in _MODE_LEGS[mode]
    ]
    ref = _xla_impl(*args, layout=layout, mode=mode)
    out = pallas_impl(*args, layout=layout, mode=mode, interpret=True)
    scale = float(np.abs(np.asarray(ref)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6 * scale)


def test_kernel_zero_weight_edges_are_zero():
    spec = SPECS['parity_lmax1']
    layout = layout_from_spec(spec)
    E = 40
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((layout.dim_x, E)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((layout.dim_sh, E)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((layout.dim_w, E)), jnp.float32)
    w = w.at[:, -5:].set(0.0)
    out = pallas_impl(x, sh, w, layout=layout, mode='msg', interpret=True)
    assert np.all(np.asarray(out)[:, -5:] == 0.0)
