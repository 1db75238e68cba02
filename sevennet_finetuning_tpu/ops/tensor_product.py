"""Clebsch-Gordan tensor products over irreps, as jit-able JAX functions.

From-scratch TPU-friendly re-design of the coupling ops the reference takes
from e3nn:

- ``uvu`` per-edge weighted TP -- the message function of the convolution
  (reference: sevenn/nn/convolution.py:72-102)
- ``uvw`` fully-connected TP -- the NequIP self-connection
  (reference: sevenn/nn/self_connection.py:11-38)

Normalization follows e3nn's 'component' irrep normalization with 'element'
path normalization so reference weights import bit-for-bit.  Specs are
built host-side (static python); apply functions are pure JAX with explicit
float32 precision (TPU default bf16 matmul is opted out of here -- forces
of an interatomic potential need full fp32).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..irreps import Irrep, Irreps, MulIrrep
from .wigner import wigner_3j

from .precision import matmul_precision


@dataclass(frozen=True)
class TPInstruction:
    i_in1: int
    i_in2: int
    i_out: int
    mode: str                 # 'uvu' | 'uvw'
    has_weight: bool
    coeff: float              # sqrt(alpha): irrep + path normalization
    weight_shape: Tuple[int, ...]
    weight_offset: int = 0    # into flat weight vector (uvu only)


def _num_elements(mode: str, mul1: int, mul2: int) -> int:
    if mode == 'uvw':
        return mul1 * mul2
    if mode == 'uvu':
        return mul2
    if mode == 'uvv':
        return mul1
    if mode == 'uuu':
        return 1
    raise ValueError(mode)


def _normalize(
    instructions: List[dict],
    irreps_in1: Irreps,
    irreps_in2: Irreps,
    irreps_out: Irreps,
) -> List[TPInstruction]:
    """Attach sqrt(alpha) coefficients (component/element normalization)."""
    out = []
    offset = 0
    for ins in instructions:
        mul1 = irreps_in1[ins['i_in1']].mul
        mul2 = irreps_in2[ins['i_in2']].mul
        ir_out = irreps_out[ins['i_out']].ir
        alpha = ir_out.dim
        x = sum(
            _num_elements(
                other['mode'],
                irreps_in1[other['i_in1']].mul,
                irreps_in2[other['i_in2']].mul,
            )
            for other in instructions
            if other['i_out'] == ins['i_out']
        )
        if x > 0:
            alpha /= x
        coeff = math.sqrt(alpha)
        if ins['mode'] == 'uvu':
            wshape = (mul1,) if mul2 == 1 else (mul1, mul2)
        elif ins['mode'] == 'uvw':
            wshape = (mul1, mul2, irreps_out[ins['i_out']].mul)
        else:
            raise ValueError(ins['mode'])
        out.append(
            TPInstruction(
                ins['i_in1'], ins['i_in2'], ins['i_out'], ins['mode'],
                ins['has_weight'], coeff, wshape, offset,
            )
        )
        offset += int(np.prod(wshape))
    return out


@dataclass(frozen=True)
class TensorProductSpec:
    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    instructions: Tuple[TPInstruction, ...]
    shared_weights: bool

    @property
    def weight_numel(self) -> int:
        return sum(int(np.prod(i.weight_shape)) for i in self.instructions)

    def weight_views(self, w_flat):
        """Split a flat weight vector/batch into per-instruction views."""
        views = []
        for ins in self.instructions:
            n = int(np.prod(ins.weight_shape))
            sl = w_flat[..., ins.weight_offset:ins.weight_offset + n]
            views.append(sl.reshape(sl.shape[:-1] + ins.weight_shape))
        return views


def uvu_tp_spec(
    irreps_in1: Irreps,
    irreps_in2: Irreps,
    irreps_out_filter: Irreps,
) -> TensorProductSpec:
    """The convolution TP: one 'uvu' path per (in1, in2, allowed l_out).

    Mirrors the reference's instruction enumeration (drop l outside the
    filter, then e3nn-sort the outputs; reference:
    sevenn/nn/convolution.py:72-87).
    """
    raw: List[dict] = []
    mid: List[MulIrrep] = []
    for i, (mul_x, ir_x) in enumerate(irreps_in1):
        for j, (_, ir_f) in enumerate(irreps_in2):
            for ir_out in ir_x * ir_f:
                if ir_out in irreps_out_filter:
                    k = len(mid)
                    mid.append(MulIrrep(mul_x, ir_out))
                    raw.append(
                        dict(i_in1=i, i_in2=j, i_out=k, mode='uvu',
                             has_weight=True)
                    )
    irreps_mid = Irreps(mid)
    irreps_mid, perm, _ = irreps_mid.sort()
    for ins in raw:
        ins['i_out'] = perm[ins['i_out']]
    instructions = _normalize(raw, irreps_in1, irreps_in2, irreps_mid)
    return TensorProductSpec(
        Irreps(irreps_in1), Irreps(irreps_in2), irreps_mid,
        tuple(instructions), shared_weights=False,
    )


def fctp_spec(
    irreps_in1: Irreps,
    irreps_in2: Irreps,
    irreps_out: Irreps,
) -> TensorProductSpec:
    """FullyConnectedTensorProduct: 'uvw' paths, internal shared weights."""
    raw: List[dict] = []
    for i, (_, ir_1) in enumerate(irreps_in1):
        for j, (_, ir_2) in enumerate(irreps_in2):
            for k, (_, ir_o) in enumerate(irreps_out):
                if ir_o in ir_1 * ir_2:
                    raw.append(
                        dict(i_in1=i, i_in2=j, i_out=k, mode='uvw',
                             has_weight=True)
                    )
    instructions = _normalize(raw, irreps_in1, irreps_in2, Irreps(irreps_out))
    return TensorProductSpec(
        Irreps(irreps_in1), Irreps(irreps_in2), Irreps(irreps_out),
        tuple(instructions), shared_weights=True,
    )


def apply_tp(
    spec: TensorProductSpec,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    weights,
) -> jnp.ndarray:
    """Evaluate the TP.

    x1: [..., irreps_in1.dim]; x2: [..., irreps_in2.dim].
    weights: flat [..., weight_numel] when shared_weights=False (per-edge),
    or a list of per-instruction arrays when shared (internal).
    """
    sl1 = spec.irreps_in1.slices()
    sl2 = spec.irreps_in2.slices()
    dtype = x1.dtype

    if spec.shared_weights:
        w_views = weights
    else:
        w_views = spec.weight_views(weights)

    n_out = len(spec.irreps_out)
    chunks: List[Optional[jnp.ndarray]] = [None] * n_out

    # uvu instructions grouped by (i_in1, i_in2): ONE outer product and
    # ONE [.., d1*d2, mul] x [d1*d2, sum_k] contraction per group cover
    # every l_out path of that input pair, instead of a per-instruction
    # einsum chain (honest-timing round 3: per-instruction HBM round
    # trips over tiny-trailing-dim tensors cost ~1.8x the grouped form)
    uvu_groups: dict = {}
    for idx, ins in enumerate(spec.instructions):
        if ins.mode == 'uvu':
            uvu_groups.setdefault((ins.i_in1, ins.i_in2), []).append(
                (idx, ins))

    for (i1, i2), items in uvu_groups.items():
        mi1 = spec.irreps_in1[i1]
        mi2 = spec.irreps_in2[i2]
        if mi2.mul != 1:
            raise NotImplementedError('uvu with filter mul > 1')
        d1, d2, mul = mi1.ir.dim, mi2.ir.dim, mi1.mul
        a = x1[..., sl1[i1]].reshape(x1.shape[:-1] + (mul, d1))
        aT = jnp.swapaxes(a, -1, -2)            # [.., d1, mul]: mul lanes
        b1 = x2[..., sl2[i2]]                   # [.., d2]
        outer = aT[..., None, :, :] * b1[..., :, None, None]
        outer = outer.reshape(outer.shape[:-3] + (d2 * d1, mul))
        Ccat = jnp.asarray(np.concatenate([
            (wigner_3j(mi1.ir.l, mi2.ir.l,
                       spec.irreps_out[ins.i_out].ir.l)
             * ins.coeff).transpose(1, 0, 2).reshape(d2 * d1, -1)
            for _, ins in items
        ], axis=-1), dtype=dtype)
        res = jnp.einsum('...pu,pK->...Ku', outer, Ccat,
                         precision=matmul_precision())  # [.., K, mul]
        off = 0
        for idx, ins in items:
            mo = spec.irreps_out[ins.i_out]
            k = mo.ir.dim
            r = res[..., off:off + k, :] * w_views[idx][..., None, :]
            off += k
            r = jnp.swapaxes(r, -1, -2).reshape(r.shape[:-2] + (mo.dim,))
            chunks[ins.i_out] = r if chunks[ins.i_out] is None \
                else chunks[ins.i_out] + r

    for idx, ins in enumerate(spec.instructions):
        if ins.mode == 'uvu':
            continue
        mi1 = spec.irreps_in1[ins.i_in1]
        mi2 = spec.irreps_in2[ins.i_in2]
        mo = spec.irreps_out[ins.i_out]
        a = x1[..., sl1[ins.i_in1]].reshape(
            x1.shape[:-1] + (mi1.mul, mi1.ir.dim)
        )
        b = x2[..., sl2[ins.i_in2]].reshape(
            x2.shape[:-1] + (mi2.mul, mi2.ir.dim)
        )
        C = jnp.asarray(
            wigner_3j(mi1.ir.l, mi2.ir.l, mo.ir.l) * ins.coeff, dtype=dtype
        )
        w = w_views[idx]
        if ins.mode == 'uvw':
            res = jnp.einsum(
                '...ui,...vj,ijk,uvw->...wk', a, b, C, w,
                precision=matmul_precision(),
            )
        else:
            raise ValueError(ins.mode)
        res = res.reshape(res.shape[:-2] + (mo.dim,))
        chunks[ins.i_out] = res if chunks[ins.i_out] is None \
            else chunks[ins.i_out] + res

    out = []
    for k, mo in enumerate(spec.irreps_out):
        if chunks[k] is None:
            out.append(
                jnp.zeros(x1.shape[:-1] + (mo.dim,), dtype=dtype)
            )
        else:
            out.append(chunks[k])
    return jnp.concatenate(out, axis=-1)


def init_tp_weights(spec: TensorProductSpec, rng: np.random.Generator):
    """e3nn-style standard-normal internal weights (uvw/shared only)."""
    assert spec.shared_weights
    return [
        rng.standard_normal(ins.weight_shape).astype(np.float32)
        for ins in spec.instructions
    ]
