"""The NequIP-style equivariant GNN potential: spec, init, apply.

From-scratch functional re-design of the reference's module-list model
(reference: sevenn/model_build.py:186-445 and sevenn/nn/*):

- a frozen, hashable ``ModelSpec`` carries every static decision (irreps
  per layer, TP instruction lists, activation names, cutoff function...)
- ``init_params`` builds a nested params dict whose keys follow the
  reference's layer names (``0_self_interaction_1`` ...) so checkpoint
  import and EWC read naturally
- ``energy_network`` computes atomic/total energies from edge vectors;
  ``apply_model`` wraps it with jax.grad over edge vectors to produce
  forces and the per-graph virial/stress, mirroring the semantics of the
  reference's from-edge gradient head (reference:
  sevenn/nn/force_output.py:133-215) with one jax.grad instead of
  manual autograd plumbing.

Everything here is pure and jit-able; batches are the padded dicts of
``model.graph``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import keys as K
from ..irreps import Irrep, Irreps, tp_out_irreps
from ..ops.gate import GateSpec, apply_gate, gate_spec
from ..ops.linear import (
    LinearSpec,
    apply_linear,
    init_linear_weights,
    linear_spec,
)
from ..ops.mlp import mlp_apply, mlp_apply_T, mlp_init
from ..ops.pallas_scatter import (
    aggregate_messages,
    gather_rows,
    scatter_rows,
)
from ..ops.radial import bessel_basis, bessel_init, poly_cutoff, xplor_cutoff
from ..ops.spherical import spherical_harmonics
from ..ops.tensor_product import (
    TensorProductSpec,
    apply_tp,
    fctp_spec,
    init_tp_weights,
    uvu_tp_spec,
)
from ..ops.util import safe_norm

Params = Dict[str, Dict[str, jnp.ndarray]]


def use_fused_conv() -> bool:
    """The fused quadrilinear CG convolution (ops/fused_conv.py) is the
    default everywhere: its XLA implementation is the oracle/CPU path
    and its Pallas kernels are the TPU path.  SEVENN_FUSED_CONV=0
    restores the round-3 per-instruction apply_tp chain (read at trace
    time, so flip it before building the step)."""
    import os

    return os.environ.get('SEVENN_FUSED_CONV', '1') != '0'


def resolve_remat(spec: 'ModelSpec', n_edge: int, remat='auto') -> bool:
    """Resolve remat='auto' from static shapes at trace time.

    Checkpointing each block cuts double-backprop activation memory by
    ~L x but costs ~2.5-3x step time on small batches, so only enable it
    when the estimated live per-edge message residuals exceed the
    activation budget (env SEVENNET_TPU_ACT_BUDGET_GB, default 10 GiB
    of the v5e's 16 GiB HBM -- params/optimizer/workspace are small next
    to activations at these sizes).

    Copies-per-residual calibration: the round-3 per-instruction chain
    keeps ~6 fp32 copies of the mid irreps per edge live across the
    force-grad vjp + param-grad passes.  The fused quadrilinear conv
    (ops/fused_conv.py) saves only the primitive's operands/outputs --
    ~3 copies -- verified empirically: the reference-scale reEWC epoch
    (35k edge slots, batch 8, rehearsal double-step = 70k eq-edges)
    runs un-rematted in HBM, 27.7 s/epoch vs 43.7 rematted
    (experiments/ft_reewc_900, round 4).
    """
    scale = 1.0
    if isinstance(remat, tuple):  # ('auto', scale): scaled estimate,
        remat, scale = remat      # e.g. 2.0 when two steps share a
        # scan body (the rehearsal epoch) and liveness is conservative
    if remat != 'auto':
        return bool(remat)
    import os

    budget_gb = float(os.environ.get('SEVENNET_TPU_ACT_BUDGET_GB', '10'))
    mid = 0
    for b in spec.blocks:
        tp = getattr(b, 'conv_tp', None)
        if tp is not None:
            mid += tp.irreps_out.dim
        else:  # gaunt blocks: 2D Fourier grid per edge
            mid += 4 * b.irreps_x.dim
    copies = 3.0 if use_fused_conv() else 6.0
    est_bytes = copies * 4.0 * float(n_edge) * float(mid) * scale
    return est_bytes > budget_gb * 2.0 ** 30


@dataclass(frozen=True)
class EdgeEmbedSpec:
    cutoff: float
    bessel_num: int = 8
    bessel_trainable: bool = True
    cutoff_function: str = 'poly_cut'      # 'poly_cut' | 'XPLOR'
    poly_cut_p: int = 6
    cutoff_on: Optional[float] = None      # for XPLOR
    lmax_edge: int = 1
    parity: int = -1                       # -1: E(3) (odd SH), +1: SE(3)
    normalize_sph: bool = True
    # radial-embedding standardization: emb -> (emb - shift) * scale,
    # applied after edge masking (reference: sevenn/scripts/train.py:45-66
    # feeding weight_shift/weight_scale into every convolution)
    weight_shift: float = 0.0
    weight_scale: float = 1.0


@dataclass(frozen=True)
class BlockSpec:
    t: int
    irreps_x: Irreps
    irreps_out: Irreps
    self_connection: str                   # 'nequip' | 'linear' | 'none'
    sc_spec: object                        # TensorProductSpec | LinearSpec
    si1: LinearSpec
    conv_tp: TensorProductSpec
    radial_hs: Tuple[int, ...]
    act_radial: str
    denominator: float
    train_denominator: bool
    si2: LinearSpec
    gate: Optional[GateSpec]               # None for MACE/gaunt blocks
    block_type: str = 'nequip'             # 'nequip' | 'mace' | 'gaunt'
    pb_spec: object = None                 # SymContraction / GauntPB spec
    si3: Optional[LinearSpec] = None       # (mace)
    conv_kind: str = 'cg'                  # 'cg' | 'gaunt'
    gaunt_conv: object = None              # GauntConvSpec when 'gaunt'


@dataclass(frozen=True)
class CustomBlockSpec:
    """User-defined interaction block (the reference's plugin hook,
    reference: sevenn/model_build.py:92-100, config key
    _custom_interaction_block_callback).

    TPU-native contract: the callback returns one of these per layer.
    ``init(rng) -> {name: ndarray}`` creates the block's parameters;
    ``apply(params, x, ctx) -> x_out`` is pure JAX.  ``ctx`` carries
    onehot, emb (radial embedding), edge_attr (SH), edge_src, edge_dst,
    n_node, and exchange_fn (None, or local->local+ghost rows for the
    halo-parallel path -- apply it before gathering edge_src)."""

    t: int
    irreps_x: 'Irreps'
    irreps_out: 'Irreps'
    init: object
    apply: object
    block_type: str = 'custom'


@dataclass(frozen=True)
class ReadoutSpec:
    as_fcn: bool
    lin1: Optional[LinearSpec] = None
    lin2: Optional[LinearSpec] = None
    fcn_hs: Tuple[int, ...] = ()
    fcn_act: str = 'relu'


@dataclass(frozen=True)
class ModelSpec:
    num_species: int
    type_map: Tuple[Tuple[int, int], ...]  # (Z, onehot idx) pairs
    edge: EdgeEmbedSpec
    blocks: Tuple[BlockSpec, ...]
    readout: ReadoutSpec
    shift: Tuple[float, ...]               # len 1 or num_species
    scale: Tuple[float, ...]
    train_shift_scale: bool = False
    use_bias_in_linear: bool = False

    @property
    def cutoff(self) -> float:
        return self.edge.cutoff

    @property
    def irreps_filter(self) -> Irreps:
        return Irreps.spherical_harmonics(
            self.edge.lmax_edge, self.edge.parity
        )


def build_nequip_block(
    t: int,
    irreps_x: Irreps,
    irreps_filter: Irreps,
    irreps_out_tp: Irreps,
    irreps_out: Irreps,
    num_species: int,
    radial_hidden: Tuple[int, ...],
    bessel_num: int,
    act_radial: str,
    act_scalar: Dict[str, str],
    act_gate: Dict[str, str],
    self_connection: str,
    denominator: float,
    train_denominator: bool,
    biases: bool,
) -> BlockSpec:
    """Assemble one interaction block (reference:
    sevenn/nn/interaction_blocks.py:22-86)."""
    gate = gate_spec(irreps_out, act_scalar, act_gate)
    irreps_gate_in = gate.irreps_in

    node_attr_irreps = Irreps(f'{num_species}x0e')
    if self_connection == 'nequip':
        sc = fctp_spec(irreps_x, node_attr_irreps, irreps_gate_in)
    elif self_connection == 'linear':
        sc = linear_spec(irreps_x, irreps_gate_in, biases=False)
    elif self_connection == 'none':
        sc = None
    else:
        raise ValueError(self_connection)

    si1 = linear_spec(irreps_x, irreps_x, biases=biases)
    conv_tp = uvu_tp_spec(irreps_x, irreps_filter, irreps_out_tp)
    # the reference builds this linear on the simplified TP output irreps
    # (same flat layout; matching structure keeps weights importable)
    si2 = linear_spec(conv_tp.irreps_out.simplify(), irreps_gate_in,
                      biases=biases)
    return BlockSpec(
        t=t,
        irreps_x=irreps_x,
        irreps_out=gate.irreps_out,
        self_connection=self_connection,
        sc_spec=sc,
        si1=si1,
        conv_tp=conv_tp,
        radial_hs=(bessel_num,) + tuple(radial_hidden)
        + (conv_tp.weight_numel,),
        act_radial=act_radial,
        denominator=denominator,
        train_denominator=train_denominator,
        si2=si2,
        gate=gate,
    )


def build_mace_block(
    t: int,
    irreps_x: Irreps,
    irreps_filter: Irreps,
    irreps_out_tp: Irreps,
    irreps_out: Irreps,
    correlation: int,
    num_species: int,
    radial_hidden: Tuple[int, ...],
    bessel_num: int,
    act_radial: str,
    self_connection: str,
    denominator: float,
    train_denominator: bool,
    biases: bool,
) -> BlockSpec:
    """MACE interaction block: conv -> si2 to uniform multiplicity ->
    symmetric contraction (product basis) -> si3; no gate (reference:
    sevenn/nn/interaction_blocks.py:89-162)."""
    from ..ops.symmetric_contraction import sym_contraction_spec

    irreps_out = Irreps(irreps_out)
    assert all(mi.ir.p == (-1) ** mi.ir.l for mi in irreps_out), (
        'mace output parity must be spherical-harmonics-like'
    )
    feature_mul = irreps_out[0].mul
    assert all(mi.mul == feature_mul for mi in irreps_out)
    conv_out_simpl = None

    node_attr_irreps = Irreps(f'{num_species}x0e')
    if self_connection == 'nequip':
        sc = fctp_spec(irreps_x, node_attr_irreps, irreps_out)
    elif self_connection == 'linear':
        sc = linear_spec(irreps_x, irreps_out, biases=False)
    else:
        sc = None

    si1 = linear_spec(irreps_x, irreps_x, biases=biases)
    conv_tp = uvu_tp_spec(irreps_x, irreps_filter, irreps_out_tp)
    conv_out_simpl = conv_tp.irreps_out.simplify()
    # uniform multiplicity for the product basis (reference:
    # interaction_blocks.py:113-118)
    irreps_si2_out = Irreps(
        [(feature_mul, mi.ir) for mi in irreps_out_tp]
    )
    si2 = linear_spec(conv_out_simpl, irreps_si2_out, biases=biases)
    pb = sym_contraction_spec(irreps_si2_out, irreps_out, correlation,
                              num_species)
    si3 = linear_spec(irreps_out, irreps_out, biases=biases)
    return BlockSpec(
        t=t,
        irreps_x=irreps_x,
        irreps_out=irreps_out,
        self_connection=self_connection,
        sc_spec=sc,
        si1=si1,
        conv_tp=conv_tp,
        radial_hs=(bessel_num,) + tuple(radial_hidden)
        + (conv_tp.weight_numel,),
        act_radial=act_radial,
        denominator=denominator,
        train_denominator=train_denominator,
        si2=si2,
        gate=None,
        block_type='mace',
        pb_spec=pb,
        si3=si3,
    )


def build_gaunt_block(
    t: int,
    irreps_x: Irreps,
    irreps_filter: Irreps,
    irreps_out_tp: Irreps,
    irreps_out: Irreps,
    num_species: int,
    radial_hidden: Tuple[int, ...],
    bessel_num: int,
    act_radial: str,
    self_connection: str,
    denominator: float,
    train_denominator: bool,
    biases: bool,
    gate_block: bool,
    act_scalar: Optional[Dict[str, str]] = None,
    act_gate: Optional[Dict[str, str]] = None,
    correlation: int = 3,
) -> BlockSpec:
    """Gaunt interaction blocks (reference:
    sevenn/nn/interaction_blocks.py:165-335).

    gate_block=True -> 'gaunt_gate': NequIP structure whose convolution
    uses the Fourier-basis Gaunt product (falling back to the CG conv
    when either side is scalar-only).  gate_block=False -> 'gaunt':
    uniform-multiplicity blocks with a Gaunt self-product basis and no
    gate."""
    from ..ops.gaunt import gaunt_conv_spec, gaunt_pb_spec

    node_attr_irreps = Irreps(f'{num_species}x0e')
    use_gaunt_conv = irreps_x.lmax > 0 and Irreps(irreps_out_tp).lmax > 0

    if gate_block:
        gate = gate_spec(irreps_out, act_scalar, act_gate)
        target = gate.irreps_in
    else:
        gate = None
        target = Irreps(irreps_out_tp)

    if self_connection == 'nequip':
        sc = fctp_spec(irreps_x, node_attr_irreps, target)
    elif self_connection == 'linear':
        sc = linear_spec(irreps_x, target, biases=False)
    else:
        sc = None

    si1 = linear_spec(irreps_x, irreps_x, biases=biases)
    if use_gaunt_conv:
        gconv = gaunt_conv_spec(
            irreps_x, irreps_filter, Irreps(irreps_out_tp),
            radial_hidden, bessel_num, act_radial,
        )
        conv_tp = uvu_tp_spec(irreps_x, irreps_filter, irreps_out_tp)
        radial_hs = (bessel_num,) + tuple(radial_hidden) \
            + (gconv.weight_numel,)
        conv_out = Irreps(irreps_out_tp)
    else:
        gconv = None
        conv_tp = uvu_tp_spec(irreps_x, irreps_filter, irreps_out_tp)
        radial_hs = (bessel_num,) + tuple(radial_hidden) \
            + (conv_tp.weight_numel,)
        conv_out = conv_tp.irreps_out.simplify()

    si2 = linear_spec(conv_out, target, biases=biases)

    pb = None
    if not gate_block:
        pb = gaunt_pb_spec(Irreps(irreps_out_tp), irreps_out, correlation)

    return BlockSpec(
        t=t,
        irreps_x=irreps_x,
        irreps_out=(gate.irreps_out if gate_block else Irreps(irreps_out)),
        self_connection=self_connection,
        sc_spec=sc,
        si1=si1,
        conv_tp=conv_tp,
        radial_hs=radial_hs,
        act_radial=act_radial,
        denominator=denominator,
        train_denominator=train_denominator,
        si2=si2,
        gate=gate,
        block_type=('gaunt_gate' if gate_block else 'gaunt'),
        pb_spec=pb,
        si3=None,
        conv_kind=('gaunt' if use_gaunt_conv else 'cg'),
        gaunt_conv=gconv,
    )


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------

def init_params(spec: ModelSpec, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    p: Params = {}

    p['edge_embedding'] = {
        'bessel_coeffs': bessel_init(
            spec.edge.cutoff, spec.edge.bessel_num
        ).astype(np.float32)
    }

    one_hot = Irreps(f'{spec.num_species}x0e')
    embed = linear_spec(one_hot, spec.blocks[0].irreps_x,
                        biases=spec.use_bias_in_linear)
    p['onehot_to_feature_x'] = _linear_params(embed, rng)

    for blk in spec.blocks:
        t = blk.t
        if blk.block_type == 'custom':
            p[f'{t}_custom_block'] = blk.init(rng)
            continue
        if blk.self_connection == 'nequip':
            p[f'{t}_self_connection_intro'] = _tp_params(blk.sc_spec, rng)
        elif blk.self_connection == 'linear':
            p[f'{t}_self_connection_intro'] = _linear_params(blk.sc_spec, rng)
        p[f'{t}_self_interaction_1'] = _linear_params(blk.si1, rng)
        conv = {
            f'weight_nn_w{i}': w
            for i, w in enumerate(mlp_init(blk.radial_hs, rng))
        }
        conv['denominator'] = np.array([blk.denominator], np.float32)
        p[f'{t}_convolution'] = conv
        p[f'{t}_self_interaction_2'] = _linear_params(blk.si2, rng)
        if blk.block_type == 'mace':
            from ..ops.symmetric_contraction import init_sym_contraction

            p[f'{t}_equivariant_product_basis'] = init_sym_contraction(
                blk.pb_spec, rng
            )
            p[f'{t}_self_interaction_3'] = _linear_params(blk.si3, rng)
        elif blk.block_type == 'gaunt':
            from ..ops.gaunt import init_gaunt_pb

            p[f'{t}_gaunt_product_basis'] = init_gaunt_pb(blk.pb_spec, rng)

    if spec.readout.as_fcn:
        p['readout_FCN'] = {
            f'w{i}': w
            for i, w in enumerate(mlp_init(spec.readout.fcn_hs, rng))
        }
    else:
        p['reduce_input_to_hidden'] = _linear_params(spec.readout.lin1, rng)
        p['reduce_hidden_to_energy'] = _linear_params(spec.readout.lin2, rng)

    p['rescale_atomic_energy'] = {
        'shift': np.asarray(spec.shift, np.float32),
        'scale': np.asarray(spec.scale, np.float32),
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


def _linear_params(s: LinearSpec, rng) -> Dict[str, np.ndarray]:
    return {f'w{i}': w for i, w in enumerate(init_linear_weights(s, rng))}


def _tp_params(s: TensorProductSpec, rng) -> Dict[str, np.ndarray]:
    return {f'w{i}': w for i, w in enumerate(init_tp_weights(s, rng))}


def _linear_w(p: Dict[str, jnp.ndarray]):
    return [p[f'w{i}'] for i in range(len(p))]


def trainable_mask(spec: ModelSpec, params: Params) -> Params:
    """Pytree of bools: which leaves receive gradient updates."""
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask['edge_embedding']['bessel_coeffs'] = spec.edge.bessel_trainable
    for blk in spec.blocks:
        if blk.block_type == 'custom':
            continue
        mask[f'{blk.t}_convolution']['denominator'] = blk.train_denominator
    mask['rescale_atomic_energy']['shift'] = spec.train_shift_scale
    mask['rescale_atomic_energy']['scale'] = spec.train_shift_scale
    return mask


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def compute_edge_vec(data: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """edge_vec = pos[j] - pos[i] + shift . cell (batched PBC)."""
    idx = data[K.EDGE_IDX]
    pos = data[K.POS]
    cell_of_edge = data[K.CELL][data[K.BATCH][idx[0]]]
    return (
        pos[idx[1]] - pos[idx[0]]
        + jnp.einsum('ei,eij->ej', data[K.CELL_SHIFT], cell_of_edge)
    )


def run_blocks(
    spec: ModelSpec,
    params: Params,
    x: jnp.ndarray,
    onehot: jnp.ndarray,
    emb: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    n_node: int,
    cap=None,
    exchange_fn=None,
    remat: bool = False,
    edges_sorted: bool = False,
    src_perm=None,
    halo_split=None,
) -> jnp.ndarray:
    """All interaction blocks (NequIP or MACE).  ``exchange_fn``, when
    given, maps local features to local+ghost rows before the gather
    (the halo-parallel path injects per-layer ppermute refreshes here).

    ``edges_sorted`` asserts edge_dst is ascending (the collate batch
    contract), enabling the Pallas sorted-segment-sum aggregation.
    ``src_perm`` (collate's K.EDGE_SRC_PERM) routes the source-gather's
    AD-transpose scatter through the same kernel.

    ``remat=True`` checkpoints each block: the training double-backprop
    otherwise keeps per-edge message tensors of every layer live, which
    does not fit HBM at large batch (recompute costs ~30% step time,
    cuts activation memory by ~L x).

    ``halo_split`` (halo-parallel path): {'loc': {...}, 'gh': {...}}
    edge partitions by source locality; the convolution computes
    local-source messages WITHOUT the exchange and ghost-source messages
    from it, so XLA overlaps the per-layer ppermutes with the local
    message math (comm/compute overlap)."""
    if cap is None:
        def cap(name, val):
            return None
        cap.noop = True
    elif remat:
        raise ValueError('intermediate capture requires remat=False')

    def run_one(blk, x, params):
        return _run_one_block(
            spec, blk, params, x, onehot, emb, edge_attr, edge_src,
            edge_dst, n_node, cap, exchange_fn, edges_sorted, src_perm,
            halo_split,
        )

    for blk in spec.blocks:
        if remat:
            x = jax.checkpoint(
                lambda x, p, _blk=blk: run_one(_blk, x, p)
            )(x, params)
        else:
            x = run_one(blk, x, params)
    return x


def _run_one_block(spec, blk, params, x, onehot, emb, edge_attr,
                   edge_src, edge_dst, n_node, cap, exchange_fn,
                   edges_sorted=False, src_perm=None, halo_split=None):
    t = blk.t
    if blk.block_type == 'custom':
        ctx = dict(onehot=onehot, emb=emb, edge_attr=edge_attr,
                   edge_src=edge_src, edge_dst=edge_dst, n_node=n_node,
                   exchange_fn=exchange_fn)
        x = blk.apply(params[f'{t}_custom_block'], x, ctx)
        cap(f'{t}_custom_block', x)
        return x
    if blk.self_connection == 'nequip':
        sc = apply_tp(
            blk.sc_spec, x, onehot,
            _linear_w(params[f'{t}_self_connection_intro']),
        )
    elif blk.self_connection == 'linear':
        sc = apply_linear(
            blk.sc_spec,
            _linear_w(params[f'{t}_self_connection_intro']), x,
        )
    else:
        sc = None
    if sc is not None:
        cap(f'{t}_self_connection_intro', sc)

    fused = blk.conv_kind == 'cg' and use_fused_conv()
    x = apply_linear(blk.si1,
                     _linear_w(params[f'{t}_self_interaction_1']), x,
                     out_stride=fused)
    if fused:
        if not getattr(cap, 'noop', False):
            from ..ops.fused_conv import stride_to_e3nn as _s2e

            cap(f'{t}_self_interaction_1', _s2e(blk.irreps_x, x))
    else:
        cap(f'{t}_self_interaction_1', x)

    conv_p = params[f'{t}_convolution']
    n_w = len(blk.radial_hs) - 1
    x_all = x if exchange_fn is None else exchange_fn(x)
    if blk.conv_kind == 'gaunt':
        from ..ops.gaunt import apply_gaunt_conv

        if halo_split is not None:
            agg = None
            for part in ('loc', 'gh'):
                ps_ = halo_split[part]
                x_in = x if part == 'loc' else exchange_fn(x)
                a = apply_gaunt_conv(
                    blk.gaunt_conv,
                    [conv_p[f'weight_nn_w{i}'] for i in range(n_w)],
                    x_in, ps_['sh'], ps_['emb'], ps_['src'],
                    ps_['dst'], n_node, jnp.ones_like(
                        conv_p['denominator']),
                    sorted_dst=True,
                )
                agg = a if agg is None else agg + a
            x = agg / conv_p['denominator']
        else:
            x = apply_gaunt_conv(
                blk.gaunt_conv,
                [conv_p[f'weight_nn_w{i}'] for i in range(n_w)],
                x_all, edge_attr, emb, edge_src, edge_dst, n_node,
                conv_p['denominator'], sorted_dst=edges_sorted,
            )
    elif fused:
        # fused edge-tile CG convolution (ops/fused_conv.py): the whole
        # radial-MLP -> grouped-CG -> weight chain runs feature-major
        # with the per-(i, path) structure in sublanes; on TPU each AD
        # mode is ONE Pallas kernel instead of the per-instruction
        # einsum chain's ~10 HBM round trips (PROFILE.md section 4)
        from ..ops.fused_conv import (
            conv_messages_T,
            layout_from_spec,
            stride_to_e3nn,
        )
        from ..ops.fused_conv_agg import conv_aggregate

        layout = layout_from_spec(blk.conv_tp)
        mlp_w = [conv_p[f'weight_nn_w{i}'] for i in range(n_w)]
        if halo_split is not None:
            # local-source messages first (no dependence on the
            # exchange), then ghost-source messages from the refreshed
            # buffer: XLA overlaps the ppermutes with the local math
            agg = None
            for part in ('loc', 'gh'):
                ps_ = halo_split[part]
                x_in = x if part == 'loc' else exchange_fn(x)
                w_e = mlp_apply(mlp_w, ps_['emb'], blk.act_radial)
                x_src = gather_rows(x_in, ps_['src'], ps_['perm'])
                a = conv_aggregate(layout, x_src, ps_['sh'], w_e,
                                   ps_['dst'], n_node)
                agg = a if agg is None else agg + a
            x = agg / conv_p['denominator']
        elif edges_sorted:
            # scatter-fused convolution: the [E, dim_msg] message
            # tensor never exists in HBM (ops/fused_conv_agg)
            w_edge = mlp_apply(mlp_w, emb, blk.act_radial)
            # gather_rows' transpose DROPS padded-edge cotangents; exact
            # here because EDGE_MASK zeroes the radial embedding, so
            # padded messages and their gradients are identically zero
            x_src = gather_rows(x_all, edge_src,
                                src_perm if exchange_fn is None
                                else None)
            x = conv_aggregate(layout, x_src, edge_attr, w_edge,
                               edge_dst, n_node)
            x = x / conv_p['denominator']
        else:
            # unsorted-dst fallback: per-edge kernel + XLA scatter-add
            w_edge_T = mlp_apply_T(mlp_w, emb.T, blk.act_radial)
            x_src = gather_rows(x_all, edge_src,
                                src_perm if exchange_fn is None
                                else None)
            msg_T = conv_messages_T(layout, x_src.T, edge_attr.T,
                                    w_edge_T)
            x = aggregate_messages(msg_T.T, edge_dst, n_node,
                                   edges_sorted)
            x = x / conv_p['denominator']
        # back to the e3nn flat layout at the (cheap) node-sized boundary
        x = stride_to_e3nn(blk.conv_tp.irreps_out, x)
    else:
        mlp_w = [conv_p[f'weight_nn_w{i}'] for i in range(n_w)]
        if halo_split is not None:
            agg = None
            for part in ('loc', 'gh'):
                ps_ = halo_split[part]
                x_in = x if part == 'loc' else exchange_fn(x)
                w_e = mlp_apply(mlp_w, ps_['emb'], blk.act_radial)
                x_src = gather_rows(x_in, ps_['src'], ps_['perm'])
                msg = apply_tp(blk.conv_tp, x_src, ps_['sh'], w_e)
                a = aggregate_messages(msg, ps_['dst'], n_node, True)
                agg = a if agg is None else agg + a
            x = agg / conv_p['denominator']
        else:
            w_edge = mlp_apply(mlp_w, emb, blk.act_radial)
            # gather_rows' transpose DROPS padded-edge cotangents; that
            # is exact here because EDGE_MASK zeroes the radial
            # embedding, so padded messages and their gradients are
            # identically zero
            x_src = gather_rows(x_all, edge_src,
                                src_perm if exchange_fn is None
                                else None)
            msg = apply_tp(blk.conv_tp, x_src, edge_attr, w_edge)
            x = aggregate_messages(msg, edge_dst, n_node, edges_sorted)
            x = x / conv_p['denominator']
    cap(f'{t}_convolution', x)

    x = apply_linear(blk.si2,
                     _linear_w(params[f'{t}_self_interaction_2']), x)
    cap(f'{t}_self_interaction_2', x)

    if blk.block_type == 'gaunt':
        from ..ops.gaunt import apply_gaunt_pb

        if sc is not None:
            x = x + sc
        x = apply_gaunt_pb(
            blk.pb_spec, params[f'{t}_gaunt_product_basis'], x
        )
        cap(f'{t}_gaunt_product_basis', x)
    elif blk.block_type == 'mace':
        from ..ops.symmetric_contraction import apply_sym_contraction

        x = apply_sym_contraction(
            blk.pb_spec, params[f'{t}_equivariant_product_basis'],
            x, onehot,
        )
        cap(f'{t}_equivariant_product_basis', x)
        x = apply_linear(
            blk.si3, _linear_w(params[f'{t}_self_interaction_3']), x
        )
        cap(f'{t}_self_interaction_3', x)
        if sc is not None:
            x = x + sc
    else:
        if sc is not None:
            x = x + sc
        x = apply_gate(blk.gate, x)
        cap(f'{t}_equivariant_gate', x)
    return x


def readout_and_rescale(
    spec: ModelSpec,
    params: Params,
    x: jnp.ndarray,
    atom_type: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Node features -> (scaled_atomic_energy, atomic_energy)."""
    if spec.readout.as_fcn:
        n_w = len(spec.readout.fcn_hs) - 1
        atomic_e = mlp_apply(
            [params['readout_FCN'][f'w{i}'] for i in range(n_w)],
            x, spec.readout.fcn_act,
        )
    else:
        h = apply_linear(spec.readout.lin1,
                         _linear_w(params['reduce_input_to_hidden']), x)
        atomic_e = apply_linear(
            spec.readout.lin2,
            _linear_w(params['reduce_hidden_to_energy']), h,
        )
    atomic_e = atomic_e[..., 0]
    scaled = atomic_e
    rp = params['rescale_atomic_energy']
    if rp['scale'].shape[0] > 1:
        atomic_e = atomic_e * rp['scale'][atom_type] \
            + rp['shift'][atom_type]
    else:
        atomic_e = atomic_e * rp['scale'][0] + rp['shift'][0]
    return scaled, atomic_e


def energy_network(
    spec: ModelSpec,
    params: Params,
    data: Dict[str, jnp.ndarray],
    edge_vec: jnp.ndarray,
    intermediates: Optional[Dict[str, jnp.ndarray]] = None,
    remat=False,
) -> Dict[str, jnp.ndarray]:
    """Edge vectors + graph -> atomic & total energies (pure, jit-able).
    ``remat`` may be True/False or 'auto' (resolved from batch shapes).

    Pass ``intermediates={}`` to capture per-stage node features (keys
    like '0_convolution', '1_equivariant_gate'...) for layer-parity checks
    against the reference.
    """
    out = dict(data)
    remat = resolve_remat(spec, data[K.EDGE_IDX].shape[1], remat)

    def cap(name, val):
        if intermediates is not None:
            intermediates[name] = val
    es = spec.edge
    n_node = data[K.POS].shape[0]
    n_graph = data[K.CELL].shape[0]
    idx = data[K.EDGE_IDX]
    edge_src = idx[1]   # messages flow j -> i (reference convention)
    edge_dst = idx[0]

    # --- edge embedding ---
    r = safe_norm(edge_vec)
    basis = bessel_basis(
        r, params['edge_embedding']['bessel_coeffs'], es.cutoff
    )
    if es.cutoff_function == 'poly_cut':
        env = poly_cutoff(r, es.cutoff, es.poly_cut_p)
    elif es.cutoff_function == 'XPLOR':
        env = xplor_cutoff(r, es.cutoff, es.cutoff_on)
    else:
        raise ValueError(es.cutoff_function)
    # padded edges are killed here once; the radial MLP maps 0 -> 0
    # exactly (no biases), so their messages and gradients vanish.
    # standardization happens INSIDE the mask so that invariant holds
    emb = basis * env[..., None]
    if es.weight_shift != 0.0 or es.weight_scale != 1.0:
        emb = (emb - es.weight_shift) * es.weight_scale
    emb = emb * data[K.EDGE_MASK][..., None]
    sh = spherical_harmonics(es.lmax_edge, normalize=es.normalize_sph)
    edge_attr = sh(edge_vec)
    out[K.EDGE_LENGTH] = r
    out[K.EDGE_EMBEDDING] = emb
    out[K.EDGE_ATTR] = edge_attr

    # --- node embedding ---
    onehot = jax.nn.one_hot(
        data[K.ATOM_TYPE], spec.num_species, dtype=edge_vec.dtype
    )
    out[K.NODE_ATTR] = onehot
    one_hot_irreps = Irreps(f'{spec.num_species}x0e')
    embed_spec = linear_spec(one_hot_irreps, spec.blocks[0].irreps_x,
                             biases=spec.use_bias_in_linear)
    x = apply_linear(embed_spec, _linear_w(params['onehot_to_feature_x']),
                     onehot)
    cap('onehot_to_feature_x', x)

    # --- interaction blocks ---
    # collate batches guarantee dst-sorted edges (model.graph.collate)
    x = run_blocks(spec, params, x, onehot, emb, edge_attr, edge_src,
                   edge_dst, n_node,
                   cap=(cap if intermediates is not None else None),
                   remat=remat, edges_sorted=True,
                   src_perm=data.get(K.EDGE_SRC_PERM))

    out[K.NODE_FEATURE] = x

    # --- readout + rescale + masked reduce ---
    scaled, atomic_e = readout_and_rescale(spec, params, x,
                                           data[K.ATOM_TYPE])
    out[K.SCALED_ATOMIC_ENERGY] = scaled
    atomic_e = atomic_e * data[K.NODE_MASK]
    out[K.ATOMIC_ENERGY] = atomic_e
    # collate emits real nodes in graph order; padded tail nodes carry
    # batch id 0, so remap them to the drop sentinel (n_graph) to keep
    # the ids ascending for the sorted-segment-sum kernel
    batch_ids = jnp.where(
        data[K.NODE_MASK] > 0, data[K.BATCH], n_graph
    )
    out[K.PRED_TOTAL_ENERGY] = aggregate_messages(
        atomic_e[:, None], batch_ids, n_graph, True
    )[:, 0]
    return out


def apply_model(
    spec: ModelSpec,
    params: Params,
    data: Dict[str, jnp.ndarray],
    remat=False,
) -> Dict[str, jnp.ndarray]:
    """Full forward: energies + forces + stress via one jax.grad over
    edge vectors (reference: sevenn/nn/force_output.py:158-215)."""
    idx = data[K.EDGE_IDX]
    n_node = data[K.POS].shape[0]
    n_graph = data[K.CELL].shape[0]
    edge_vec = compute_edge_vec(data)

    def total_e(ev):
        out = energy_network(spec, params, data, ev, remat=remat)
        return jnp.sum(out[K.PRED_TOTAL_ENERGY]), out

    fij, out = jax.grad(total_e, has_aux=True)(edge_vec)

    # idx[0] is ascending by the collate batch contract; the src-side
    # scatter rides the kernel via the precomputed src-sort permutation
    pf = aggregate_messages(fij, idx[0], n_node, True)
    nf = scatter_rows(fij, idx[1], n_node,
                      perm=data.get(K.EDGE_SRC_PERM))
    out[K.PRED_FORCE] = pf - nf

    # per-edge virial, Voigt (xx, yy, zz, xy, yz, zx), summed per graph
    diag = edge_vec * fij
    voigt = jnp.concatenate(
        [
            diag,
            (edge_vec[:, 0] * fij[:, 1])[:, None],
            (edge_vec[:, 1] * fij[:, 2])[:, None],
            (edge_vec[:, 2] * fij[:, 0])[:, None],
        ],
        axis=-1,
    )
    # batch ids of dst-sorted edges are ascending (node offsets grow
    # monotonically per graph); sentinel edges index row n_node whose
    # BATCH entry is the last graph -- their voigt rows are exactly zero
    batch_of_edge = jnp.where(
        idx[0] < n_node,
        data[K.BATCH][jnp.minimum(idx[0], n_node - 1)],
        n_graph,
    )
    virial = aggregate_messages(voigt, batch_of_edge, n_graph, True)
    out[K.PRED_STRESS] = -virial / data[K.CELL_VOLUME][:, None]
    return out
