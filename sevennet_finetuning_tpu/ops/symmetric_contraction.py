"""MACE-style symmetric contraction (higher-order product basis), JAX.

Re-derivation of the symmetric contraction of MACE (Batatia et al.,
arXiv:2206.07697, Eq. 10-11), the op behind the reference's equivariant
product basis (reference: sevenn/nn/equivariant_product_basis.py:43-327):
node features x in a strided layout [batch, channel, dim] are raised to
the correlation-nu tensor power and contracted against precomputed
symmetrized coupling bases (U tensors) with per-element weights, via the
Horner-like recursion over nu.

U tensors are built from our Wigner-3j machinery (component
normalization: each coupling step scales by sqrt(2l_out+1)), host-side
and cached.  No opt_einsum_fx: contraction order is fixed explicitly and
XLA fuses the rest.
"""

from __future__ import annotations

import string
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..irreps import Irrep, Irreps
from .wigner import wigner_3j

from .precision import matmul_precision


@lru_cache(maxsize=None)
def _wigner_nj(coupling: Irreps, nu: int) -> Tuple[Tuple[Irrep, np.ndarray],
                                                   ...]:
    """All couplings of nu copies of the (mul-1) coupling irreps:
    [(ir_out, C[dim_out, d, d, ..., d])] with component normalization."""
    d = coupling.dim
    if nu == 1:
        out = []
        e = np.eye(d)
        i = 0
        for mi in coupling:
            assert mi.mul == 1, 'coupling irreps must have multiplicity 1'
            ir = mi.ir
            out.append((ir, e[i:i + ir.dim].reshape(ir.dim, d)))
            i += ir.dim
        return tuple(out)

    prev = _wigner_nj(coupling, nu - 1)
    ret: List[Tuple[Irrep, np.ndarray]] = []
    for ir_left, C_left in prev:
        i = 0
        for mi in coupling:
            ir = mi.ir
            for ir_out in ir_left * ir:
                C = wigner_3j(ir_out.l, ir_left.l, ir.l).copy()
                C *= np.sqrt(ir_out.dim)  # component normalization
                # couple: C[k, j, l] x C_left[j, d^(nu-1)]
                C2 = np.einsum(
                    'kjl,jm->kml', C, C_left.reshape(ir_left.dim, -1)
                ).reshape((ir_out.dim,) + (d,) * (nu - 1) + (ir.dim,))
                E = np.zeros((ir_out.dim,) + (d,) * nu)
                E[..., i:i + ir.dim] = C2
                ret.append((ir_out, E))
            i += ir.dim
    return tuple(sorted(ret, key=lambda t: t[0]._key()))


@lru_cache(maxsize=None)
def u_matrix(coupling: Irreps, ir_out: Irrep, nu: int) -> np.ndarray:
    """Stack of coupling paths: shape (dim_out, d, ..., d [nu], n_paths);
    the leading axis is dropped for scalar outputs (reference squeeze)."""
    paths = [
        C for ir, C in _wigner_nj(coupling, nu) if ir == ir_out
    ]
    if not paths:
        shape = (ir_out.dim,) + (coupling.dim,) * nu + (0,)
        U = np.zeros(shape)
    else:
        U = np.stack(paths, axis=-1)
    if ir_out.l == 0:
        U = U[0]
    return np.ascontiguousarray(U, dtype=np.float64)


# index letters for the nu tensor-power axes (disjoint from b/c/k/e/M)
_AX = 'wxvnzrtyuops'


@dataclass(frozen=True)
class SymContractionSpec:
    """One Contraction per output irrep entry (shared channel count)."""

    irreps_in: Irreps          # strided features: all muls equal
    irreps_out: Irreps
    correlation: int
    num_elements: int

    @property
    def num_features(self) -> int:
        return self.irreps_in[0].mul

    @property
    def coupling(self) -> Irreps:
        return Irreps([(1, mi.ir) for mi in self.irreps_in])


def sym_contraction_spec(
    irreps_in: Irreps,
    irreps_out: Irreps,
    correlation: int,
    num_elements: int,
) -> SymContractionSpec:
    irreps_in = Irreps(irreps_in)
    mul = irreps_in[0].mul
    assert all(mi.mul == mul for mi in irreps_in), (
        'symmetric contraction expects uniform multiplicity'
    )
    return SymContractionSpec(irreps_in, Irreps(irreps_out), correlation,
                              num_elements)


def init_sym_contraction(spec: SymContractionSpec,
                         rng: np.random.Generator):
    """Weights per output irrep and per nu: [num_elements, n_paths, C],
    init randn/n_paths (reference: equivariant_product_basis.py:244-301)."""
    params = {}
    for oi, mo in enumerate(spec.irreps_out):
        for nu in range(1, spec.correlation + 1):
            U = u_matrix(spec.coupling, mo.ir, nu)
            k = U.shape[-1]
            params[f'o{oi}_nu{nu}'] = (
                rng.standard_normal(
                    (spec.num_elements, k, spec.num_features)
                ) / max(k, 1)
            ).astype(np.float32)
    return params


def apply_sym_contraction(
    spec: SymContractionSpec,
    params,
    x_flat: jnp.ndarray,
    node_attr: jnp.ndarray,
) -> jnp.ndarray:
    """x_flat: [..., irreps_in.dim] (flat [mul, m] blocks);
    node_attr: [..., num_elements] one-hot.  Returns [..., irreps_out.dim].
    """
    dtype = x_flat.dtype
    C = spec.num_features
    d = spec.coupling.dim
    # flat -> strided [batch, C, d]
    blocks = []
    offset = 0
    for mi in spec.irreps_in:
        b = x_flat[..., offset:offset + mi.dim].reshape(
            x_flat.shape[:-1] + (C, mi.ir.dim)
        )
        blocks.append(b)
        offset += mi.dim
    x = jnp.concatenate(blocks, axis=-1)  # [..., C, d]

    outs = []
    for oi, mo in enumerate(spec.irreps_out):
        lout = mo.ir.l
        nu_max = spec.correlation
        m_ax = 'M' if lout > 0 else ''

        # per-element weights -> per-node: W[b, k, c]
        def wnode(nu):
            w = jnp.asarray(params[f'o{oi}_nu{nu}'], dtype)
            return jnp.einsum('be,ekc->bkc', node_attr, w,
                              precision=matmul_precision())

        # main term (nu = nu_max):
        # U[(M), i1..inu, k] W[b,k,c] x[b,c,i_nu] -> [b, c, (M), i1..i_{nu-1}]
        U = jnp.asarray(u_matrix(spec.coupling, mo.ir, nu_max), dtype)
        idx = _AX[:nu_max]                      # i1..inu
        sub_u = f'{m_ax}{idx}k'
        out = jnp.einsum(
            f'{sub_u},bkc,bc{idx[-1]}->bc{m_ax}{idx[:-1]}',
            U, wnode(nu_max), x, precision=matmul_precision(),
        )
        for nu in range(nu_max - 1, 0, -1):
            U_nu = jnp.asarray(u_matrix(spec.coupling, mo.ir, nu), dtype)
            idx = _AX[:nu]
            c_tensor = jnp.einsum(
                f'{m_ax}{idx}k,bkc->bc{m_ax}{idx}',
                U_nu, wnode(nu), precision=matmul_precision(),
            )
            c_tensor = c_tensor + out
            out = jnp.einsum(
                f'bc{m_ax}{idx},bc{idx[-1]}->bc{m_ax}{idx[:-1]}',
                c_tensor, x, precision=matmul_precision(),
            )
        # out: [b, c] or [b, c, M] -> flat [b, c*dim_out]
        outs.append(out.reshape(out.shape[0], -1))
    return jnp.concatenate(outs, axis=-1)
