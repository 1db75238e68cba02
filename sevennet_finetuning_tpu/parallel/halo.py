"""Spatially-decomposed multi-device inference with per-layer halo exchange.

TPU-native redesign of the reference's parallel MD execution model
(reference: sevenn/pair_e3gnn/pair_e3gnn_parallel.cpp:207-541 and the
patched MPI CommBrick, comm_brick.cpp:1057-1120): the atom graph is
partitioned into slab domains over a device mesh axis; each device owns
its atoms' features, and ghost (boundary) features are refreshed from
their owners between every message-passing layer with ``lax.ppermute``
collectives over ICI -- one left and one right phase per exchange (slabs
only face-neighbor-communicate, like the reference's brick swaps).

Key re-design decisions vs the reference:
- ONE program under ``shard_map`` instead of L+1 TorchScript segments;
  ``jax.grad`` through the ppermute collectives produces exactly the
  reverse halo accumulation the C++ drives by hand (reference:
  pair_e3gnn_parallel.cpp:404-454) -- here only the final force
  gather-back is explicit, mirroring reverse_comm once instead of once
  per layer.
- static padded ghost/edge capacities (the reference's adaptive comm
  buffer growth becomes fixed-size slots, so XLA compiles one program).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..data.neighborlist import neighbor_list
from ..data.vasp import Structure
from ..irreps import Irreps
from ..model.nequip import ModelSpec, Params, _linear_w
from ..ops.gate import apply_gate
from ..ops.linear import apply_linear, linear_spec
from ..ops.mlp import mlp_apply
from ..ops.radial import bessel_basis, poly_cutoff, xplor_cutoff
from ..ops.spherical import spherical_harmonics
from ..ops.tensor_product import apply_tp
from ..ops.util import safe_norm

SP_AXIS = 'sp'


@dataclass
class HaloPlan:
    """Static decomposition: per-device padded arrays (leading axis D)."""

    n_dev: int
    n_local: int              # padded local-atom capacity per device
    cap_ghost: int            # padded ghost capacity per direction
    n_edge: int               # padded edge capacity per device
    atom_type: np.ndarray     # [D, n_local] i32
    node_mask: np.ndarray     # [D, n_local] f32
    owner_perm: np.ndarray    # [D, n_local] global atom id (-1 pad)
    edge_idx: np.ndarray      # [D, 2, n_edge]: dst local; src in loc+ghost
    edge_shift: np.ndarray    # [D, n_edge, 3]
    edge_mask: np.ndarray     # [D, n_edge]
    send_r: np.ndarray        # [D, cap_ghost] local rows sent to d+1
    send_r_mask: np.ndarray
    send_l: np.ndarray        # [D, cap_ghost] local rows sent to d-1
    send_l_mask: np.ndarray
    cell: np.ndarray          # [3, 3]
    volume: float
    n_atoms: int


def build_halo_plan(
    s: Structure,
    cutoff: float,
    type_map: Dict[int, int],
    n_dev: int,
    axis: int = 0,
    pad_quantum: int = 8,
) -> HaloPlan:
    """Partition one periodic structure into slab domains along a cell
    axis.  Slab width must exceed the cutoff so ghosts come only from
    face neighbors (the reference aborts identically, reference:
    sevenn/pair_e3gnn/comm_brick.cpp:1071)."""
    pos = np.asarray(s.pos, float)
    cell = np.asarray(s.cell, float)
    n = len(pos)
    frac = (pos @ np.linalg.inv(cell)) % 1.0
    dom = np.minimum((frac[:, axis] * n_dev).astype(int), n_dev - 1)

    height = abs(np.linalg.det(cell)) / np.linalg.norm(
        np.cross(cell[(axis + 1) % 3], cell[(axis + 2) % 3])
    )
    if n_dev > 2 and height / n_dev < cutoff:
        raise ValueError(
            f'slab width {height / n_dev:.2f} A < cutoff {cutoff}: too '
            'many devices for this cell (face-neighbor halo only)'
        )

    idx_i, idx_j, shift, _ = neighbor_list(pos, cell, s.pbc, cutoff)
    z = s.atomic_numbers
    types = np.array([type_map[int(v)] for v in z], np.int32)

    locals_of = [np.where(dom == d)[0] for d in range(n_dev)]
    g2l = {}
    for d, ids in enumerate(locals_of):
        for li, gi in enumerate(ids):
            g2l[gi] = (d, li)

    def qpad(x):
        return max(pad_quantum, int(np.ceil(x / pad_quantum)) * pad_quantum)

    n_local = qpad(max(len(ids) for ids in locals_of))

    # ghost sets per device and direction
    ghosts_from = [[set(), set()] for _ in range(n_dev)]  # [from_l, from_r]
    for a, b in zip(idx_i, idx_j):
        d, _ = g2l[a]
        e, _ = g2l[b]
        if e == d:
            continue
        if e == (d - 1) % n_dev:
            ghosts_from[d][0].add(b)
        elif e == (d + 1) % n_dev:
            ghosts_from[d][1].add(b)
        else:
            raise ValueError(
                'edge crosses non-adjacent domains; decrease device count'
            )
    ghosts_from = [
        [np.array(sorted(g), dtype=np.int64) for g in pair]
        for pair in ghosts_from
    ]
    cap_ghost = qpad(
        max((max(len(g[0]), len(g[1])) for g in ghosts_from), default=1)
    )

    # sender packs in the receiver's sorted order
    send_r = np.zeros((n_dev, cap_ghost), np.int32)
    send_r_mask = np.zeros((n_dev, cap_ghost), np.float32)
    send_l = np.zeros((n_dev, cap_ghost), np.int32)
    send_l_mask = np.zeros((n_dev, cap_ghost), np.float32)
    for d in range(n_dev):
        for k, gid in enumerate(ghosts_from[(d + 1) % n_dev][0]):
            assert g2l[gid][0] == d
            send_r[d, k] = g2l[gid][1]
            send_r_mask[d, k] = 1.0
        for k, gid in enumerate(ghosts_from[(d - 1) % n_dev][1]):
            assert g2l[gid][0] == d
            send_l[d, k] = g2l[gid][1]
            send_l_mask[d, k] = 1.0

    # per-device edge lists (dst-owner partitioning; messages flow j -> i)
    per_dev = [[] for _ in range(n_dev)]
    for eidx, (a, b) in enumerate(zip(idx_i, idx_j)):
        d, la = g2l[a]
        e, lb = g2l[b]
        if e == d:
            slot = lb
        else:
            side = 0 if e == (d - 1) % n_dev else 1
            slot = n_local + side * cap_ghost + int(
                np.searchsorted(ghosts_from[d][side], b)
            )
        per_dev[d].append((la, slot, shift[eidx]))

    n_edge = qpad(max(len(e) for e in per_dev))
    edge_idx = np.zeros((n_dev, 2, n_edge), np.int32)
    edge_shift = np.zeros((n_dev, n_edge, 3), np.float32)
    edge_mask = np.zeros((n_dev, n_edge), np.float32)
    for d, edges in enumerate(per_dev):
        for k, (la, sb, sh) in enumerate(edges):
            edge_idx[d, :, k] = (la, sb)
            edge_shift[d, k] = sh
            edge_mask[d, k] = 1.0

    atom_type = np.zeros((n_dev, n_local), np.int32)
    node_mask = np.zeros((n_dev, n_local), np.float32)
    owner_perm = np.full((n_dev, n_local), -1, np.int64)
    for d, ids in enumerate(locals_of):
        atom_type[d, :len(ids)] = types[ids]
        node_mask[d, :len(ids)] = 1.0
        owner_perm[d, :len(ids)] = ids

    return HaloPlan(
        n_dev=n_dev, n_local=n_local, cap_ghost=cap_ghost, n_edge=n_edge,
        atom_type=atom_type, node_mask=node_mask, owner_perm=owner_perm,
        edge_idx=edge_idx, edge_shift=edge_shift, edge_mask=edge_mask,
        send_r=send_r, send_r_mask=send_r_mask,
        send_l=send_l, send_l_mask=send_l_mask,
        cell=cell.astype(np.float32), volume=float(s.volume), n_atoms=n,
    )


def _exchange(x_loc, send_r, send_r_mask, send_l, send_l_mask, n_dev):
    """Halo refresh -> [2*cap_ghost, ...] (from-left block, from-right
    block).  Differentiable; grad transposes to the reverse halo-sum."""
    cap = send_r.shape[0]
    if n_dev == 1:
        return jnp.zeros((2 * cap,) + x_loc.shape[1:], x_loc.dtype)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    mshape = (-1,) + (1,) * (x_loc.ndim - 1)
    from_left = lax.ppermute(
        x_loc[send_r] * send_r_mask.reshape(mshape), SP_AXIS, fwd
    )
    from_right = lax.ppermute(
        x_loc[send_l] * send_l_mask.reshape(mshape), SP_AXIS, bwd
    )
    return jnp.concatenate([from_left, from_right], axis=0)


def make_halo_forward(spec: ModelSpec, params: Params, plan: HaloPlan,
                      mesh: Mesh):
    """Jitted distributed forward:
    pos [D, n_local, 3] (sharded over 'sp') ->
    (total energy scalar, forces [D, n_local, 3], stress voigt [6]).

    ``params`` are bound at call time (kept as jit arguments, replicated
    over the mesh -- constant-baked weights dispatch ~100x slower on
    tunneled runtimes)."""
    es = spec.edge
    sh_fn = spherical_harmonics(es.lmax_edge, normalize=es.normalize_sph)
    n_dev = plan.n_dev
    cap = plan.cap_ghost
    one_hot_irreps = Irreps(f'{spec.num_species}x0e')
    embed_spec = linear_spec(one_hot_irreps, spec.blocks[0].irreps_x,
                             biases=spec.use_bias_in_linear)
    cellT = jnp.asarray(plan.cell)

    def network_energy(params, edge_vec, atom_type, node_mask, dst, src,
                       edge_mask, send_r, send_r_m, send_l, send_l_m):
        """Edge vectors -> psum'd total energy (per-layer halo inside)."""
        from ..model.nequip import readout_and_rescale, run_blocks

        r = safe_norm(edge_vec)
        basis = bessel_basis(
            r, params['edge_embedding']['bessel_coeffs'], es.cutoff
        )
        if es.cutoff_function == 'poly_cut':
            env = poly_cutoff(r, es.cutoff, es.poly_cut_p)
        else:
            env = xplor_cutoff(r, es.cutoff, es.cutoff_on)
        emb = basis * env[..., None] * edge_mask[..., None]
        edge_attr = sh_fn(edge_vec)
        onehot = jax.nn.one_hot(atom_type, spec.num_species,
                                dtype=edge_vec.dtype)
        x = apply_linear(embed_spec,
                         _linear_w(params['onehot_to_feature_x']), onehot)

        def exchange_fn(x_loc):
            # per-layer ghost refresh (reference: forward_comm between
            # conv segments)
            ghosts = _exchange(x_loc, send_r, send_r_m, send_l, send_l_m,
                               n_dev)
            return jnp.concatenate([x_loc, ghosts], axis=0)

        x = run_blocks(spec, params, x, onehot, emb, edge_attr, src, dst,
                       plan.n_local, exchange_fn=exchange_fn)
        _, atomic_e = readout_and_rescale(spec, params, x, atom_type)
        return lax.psum(jnp.sum(atomic_e * node_mask), SP_AXIS)

    def shard_fn(params, pos, atom_type, node_mask, edge_idx, edge_shift,
                 edge_mask, send_r, send_r_m, send_l, send_l_m):
        pos, atom_type, node_mask = pos[0], atom_type[0], node_mask[0]
        edge_idx, edge_shift, edge_mask = (
            edge_idx[0], edge_shift[0], edge_mask[0]
        )
        send_r, send_r_m = send_r[0], send_r_m[0]
        send_l, send_l_m = send_l[0], send_l_m[0]
        dst, src = edge_idx[0], edge_idx[1]

        ghost_pos = _exchange(pos, send_r, send_r_m, send_l, send_l_m,
                              n_dev)
        pos_all = jnp.concatenate([pos, ghost_pos], axis=0)
        edge_vec = (
            pos_all[src] - pos[dst]
            + jnp.einsum('ei,ij->ej', edge_shift, cellT)
        )

        energy, fij = jax.value_and_grad(
            lambda ev: network_energy(
                params, ev, atom_type, node_mask, dst, src, edge_mask,
                send_r, send_r_m, send_l, send_l_m,
            )
        )(edge_vec)

        # forces: F = scatter(+fij -> dst) - scatter(fij -> src); the
        # src side includes ghost slots whose sums return to their owners
        # via one reverse exchange (reference: reverse_comm semantics)
        pf = jax.ops.segment_sum(fij, dst, num_segments=plan.n_local)
        nf_all = jax.ops.segment_sum(
            fij, src, num_segments=plan.n_local + 2 * cap
        )
        nf = nf_all[:plan.n_local]
        if n_dev > 1:
            fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            # ghosts-from-left block came via fwd perm; its adjoint sum
            # returns via bwd, landing on the owner's send_r rows
            back_r = lax.ppermute(
                nf_all[plan.n_local:plan.n_local + cap], SP_AXIS, bwd
            )
            back_l = lax.ppermute(
                nf_all[plan.n_local + cap:], SP_AXIS, fwd
            )
            nf = nf.at[send_r].add(back_r * send_r_m[:, None])
            nf = nf.at[send_l].add(back_l * send_l_m[:, None])
        forces = pf - nf

        diag = edge_vec * fij
        voigt = jnp.stack([
            jnp.sum(diag[:, 0]), jnp.sum(diag[:, 1]), jnp.sum(diag[:, 2]),
            jnp.sum(edge_vec[:, 0] * fij[:, 1]),
            jnp.sum(edge_vec[:, 1] * fij[:, 2]),
            jnp.sum(edge_vec[:, 2] * fij[:, 0]),
        ])
        stress = -lax.psum(voigt, SP_AXIS) / plan.volume
        return energy[None], forces[None], stress[None]

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    sharded = P(SP_AXIS)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(),) + (sharded,) * 10,
        out_specs=(P(SP_AXIS), P(SP_AXIS), P(SP_AXIS)),
    )

    statics = (
        jnp.asarray(plan.atom_type), jnp.asarray(plan.node_mask),
        jnp.asarray(plan.edge_idx), jnp.asarray(plan.edge_shift),
        jnp.asarray(plan.edge_mask),
        jnp.asarray(plan.send_r), jnp.asarray(plan.send_r_mask),
        jnp.asarray(plan.send_l), jnp.asarray(plan.send_l_mask),
    )

    @jax.jit
    def jforward(p, pos_sharded):
        e, f, s = fn(p, pos_sharded, *statics)
        return e[0], f, s[0]

    def forward(pos_sharded):
        return jforward(params, pos_sharded)

    return forward


def gather_forces(plan: HaloPlan, forces_sharded) -> np.ndarray:
    """[D, n_local, 3] device layout -> [n_atoms, 3] global order."""
    f = np.asarray(forces_sharded).reshape(plan.n_dev * plan.n_local, 3)
    perm = np.asarray(plan.owner_perm).reshape(-1)
    out = np.zeros((plan.n_atoms, 3), f.dtype)
    valid = perm >= 0
    out[perm[valid]] = f[valid]
    return out


def scatter_positions(plan: HaloPlan, pos: np.ndarray) -> np.ndarray:
    """[n_atoms, 3] global -> [D, n_local, 3] device layout."""
    out = np.zeros((plan.n_dev, plan.n_local, 3), np.float32)
    for d in range(plan.n_dev):
        ids = plan.owner_perm[d]
        valid = ids >= 0
        out[d, valid] = pos[ids[valid]]
    return out
