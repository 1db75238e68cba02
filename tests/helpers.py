"""Shared test utilities: rotation representations from first principles."""

import numpy as np

from sevennet_finetuning_tpu.irreps import Irreps
from sevennet_finetuning_tpu.ops.spherical import spherical_harmonics


def wigner_D_from_R(l: int, R: np.ndarray) -> np.ndarray:
    """D_l with Y_l(R v) = D_l @ Y_l(v), solved from sampled SH values."""
    if l == 0:
        return np.ones((1, 1))
    sh = spherical_harmonics(l, normalize=True, normalization='norm')
    rng = np.random.default_rng(12345)
    V = rng.normal(size=(max(64, 4 * (2 * l + 1)), 3))
    A = np.asarray(sh(V))[:, l * l:(l + 1) * (l + 1)]
    B = np.asarray(sh(V @ R.T))[:, l * l:(l + 1) * (l + 1)]
    # B_i = D A_i (rows) => A @ D.T = B
    Dt, *_ = np.linalg.lstsq(A, B, rcond=None)
    return Dt.T


def rep_matrix(irreps: Irreps, R: np.ndarray, parity_sign: int = 1
               ) -> np.ndarray:
    """Block-diagonal representation of (R, optional inversion) on irreps."""
    blocks = []
    for mul, ir in Irreps(irreps):
        D = wigner_D_from_R(ir.l, R)
        if parity_sign == -1:
            D = D * ir.p
        for _ in range(mul):
            blocks.append(D)
    n = sum(b.shape[0] for b in blocks)
    out = np.zeros((n, n))
    pos = 0
    for b in blocks:
        d = b.shape[0]
        out[pos:pos + d, pos:pos + d] = b
        pos += d
    return out
