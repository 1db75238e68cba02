"""Central matmul-precision policy for the equivariant ops.

On TPU, f32 ``dot_general`` is emulated on the bf16 MXU; the
``Precision`` enum picks the pass count:

- ``HIGHEST`` (bf16x6): full f32 emulation, the default -- forces are
  double-backprop gradients and parity tests run at 1e-5.
- ``HIGH`` (bf16x3): ~2^-21 relative error at twice the MXU throughput.
- ``DEFAULT`` (bf16x1): ~2^-9 -- too lossy for force training; exposed
  for experiments only.

``SEVENN_MATMUL_PRECISION=high`` flips every CG tensor-product / linear
/ radial-MLP / symmetric-contraction matmul at trace time (read once per
jit trace, so set it before building the step).
"""

import os

from jax import lax

_TABLE = {
    'highest': lax.Precision.HIGHEST,
    'high': lax.Precision.HIGH,
    'default': lax.Precision.DEFAULT,
}


def matmul_precision() -> lax.Precision:
    name = os.environ.get('SEVENN_MATMUL_PRECISION', 'highest').lower()
    return _TABLE[name]
