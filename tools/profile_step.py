"""Break the fine-tune train step into phases and time each on the chip.

Usage: python tools/profile_step.py [--trace DIR]

Phases timed separately (same workload as bench.py):
  - forward energy only (no force grad)
  - forward energy+force+stress (one jax.grad over edge vec)
  - full train step (value_and_grad over params + adam)
  - radial MLP alone over all edges
  - uvu TP + scatter alone (one layer's shapes)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(fn, *args, n=30):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace', default=None)
    args = ap.parse_args()

    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from sevennet_finetuning_tpu import keys as K
    from sevennet_finetuning_tpu.compat.known_models import (
        SEVENNET_0_11JULY2024,
    )
    from sevennet_finetuning_tpu.data.elements import type_map_from_species
    from sevennet_finetuning_tpu.data.vasp import read_outcar
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.graph import (
        bucket_capacity,
        collate,
        structure_to_graph,
    )
    from sevennet_finetuning_tpu.model.nequip import (
        apply_model,
        energy_network,
        compute_edge_vec,
        init_params,
        trainable_mask,
    )
    from sevennet_finetuning_tpu.train.loss import (
        build_loss_fn,
        loss_specs_from_config,
    )
    from sevennet_finetuning_tpu.train.optim import build_optimizer

    BATCH = 8
    CUTOFF = 5.0
    structs = []
    for lbl in (1, 2):
        for i in range(1, 6):
            idx = i if lbl == 1 else i + 5
            structs.extend(read_outcar(
                f'/root/reference/example_inputs/data/label_{lbl}'
                f'/OUTCAR_{idx}'))
    tm = type_map_from_species({sp for s in structs for sp in s.species})
    cfg = dict(SEVENNET_0_11JULY2024)
    cfg.update({
        K.NUM_SPECIES: len(tm), K.TYPE_MAP: tm, K.CUTOFF: CUTOFF,
        K.SHIFT: [-5.0] * len(tm), K.SCALE: [1.0] * len(tm),
        K.CONV_DENOMINATOR: 36.0, K.IS_TRAIN_STRESS: True,
        K.OPTIMIZER: 'adam', K.OPTIM_PARAM: {'lr': 1e-4},
        K.LOSS: 'huber', K.LOSS_PARAM: {'delta': 0.01},
        K.FORCE_WEIGHT: 1.0, K.STRESS_WEIGHT: 0.01,
    })
    spec = build_model_spec(cfg)
    params = init_params(spec, seed=0)

    graphs = [structure_to_graph(s, CUTOFF, tm) for s in structs]
    pool = (graphs * ((BATCH + len(graphs) - 1) // len(graphs)))[:BATCH]
    n_edges_real = sum(g[K.EDGE_IDX].shape[1] for g in pool)
    n_node = bucket_capacity(sum(len(g[K.POS]) for g in pool))
    n_edge = bucket_capacity(n_edges_real)
    batch = collate(pool, n_node=n_node, n_edge=n_edge, n_graph=BATCH)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k not in (K.INFO, K.USER_LABEL)}
    print(f'n_node={n_node} n_edge={n_edge} real_edges={n_edges_real}')

    loss_fn = build_loss_fn(loss_specs_from_config(cfg))
    tx, _ = build_optimizer(cfg, trainable_mask(spec, params))
    opt_state = tx.init(params)

    @jax.jit
    def fwd_energy(p, b):
        ev = compute_edge_vec(b)
        return energy_network(spec, p, b, ev)[K.PRED_TOTAL_ENERGY]

    @jax.jit
    def fwd_full(p, b):
        out = apply_model(spec, p, b)
        return out[K.PRED_TOTAL_ENERGY], out[K.PRED_FORCE]

    @jax.jit
    def train_step(p, o, b):
        def lfn(pp):
            out = apply_model(spec, pp, b, remat=True)
            return loss_fn(pp, out)[0]
        total, grads = jax.value_and_grad(lfn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, total

    @jax.jit
    def train_step_noremat(p, o, b):
        def lfn(pp):
            out = apply_model(spec, pp, b, remat=False)
            return loss_fn(pp, out)[0]
        total, grads = jax.value_and_grad(lfn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, total

    print(f'fwd energy-only:       {timeit(fwd_energy, params, batch):8.3f} ms')
    print(f'fwd energy+F+S:        {timeit(fwd_full, params, batch):8.3f} ms')
    print(f'train step (remat):    {timeit(train_step, params, opt_state, batch):8.3f} ms')
    try:
        t = timeit(train_step_noremat, params, opt_state, batch)
        print(f'train step (noremat):  {t:8.3f} ms')
    except Exception as e:  # OOM
        print(f'train step (noremat):  failed ({type(e).__name__})')

    # micro: one layer's radial MLP + TP + scatter
    blk = spec.blocks[0]
    from sevennet_finetuning_tpu.ops.mlp import mlp_apply
    from sevennet_finetuning_tpu.ops.tensor_product import apply_tp

    emb_dim = blk.radial_hs[0]
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(n_edge, emb_dim)), jnp.float32)
    x = jnp.asarray(
        rng.normal(size=(n_node, blk.conv_tp.irreps_in1.dim)), jnp.float32)
    ea = jnp.asarray(
        rng.normal(size=(n_edge, blk.conv_tp.irreps_in2.dim)), jnp.float32)
    src = batch[K.EDGE_IDX][0]
    dst = batch[K.EDGE_IDX][1]
    wkeys = [f'weight_nn_w{i}' for i in range(len(blk.radial_hs) - 1)]
    wp = [params[f'{blk.t}_convolution'][k] for k in wkeys]

    @jax.jit
    def radial_only(wp, emb):
        return mlp_apply(wp, emb, blk.act_radial)

    @jax.jit
    def conv_only(wp, x, ea, emb):
        w = mlp_apply(wp, emb, blk.act_radial)
        msg = apply_tp(blk.conv_tp, x[src], ea, w)
        return jax.ops.segment_sum(msg, dst, num_segments=n_node)

    print(f'L0 radial MLP:         {timeit(radial_only, wp, emb):8.3f} ms')
    print(f'L0 MLP+TP+scatter:     {timeit(conv_only, wp, x, ea, emb):8.3f} ms')

    # the aggregation alone: Pallas sorted-segment-sum vs XLA scatter-add
    from sevennet_finetuning_tpu.ops.pallas_scatter import segment_sum_sorted

    mid = jnp.asarray(
        rng.normal(size=(n_edge, blk.conv_tp.irreps_out.dim)), jnp.float32)
    dst_sorted = jnp.sort(dst)

    @jax.jit
    def scatter_pallas(m, d):
        return segment_sum_sorted(m, d, n_node)

    @jax.jit
    def scatter_xla(m, d):
        return jax.ops.segment_sum(m, d, num_segments=n_node,
                                   indices_are_sorted=True)

    if jax.default_backend() == 'tpu':
        print(f'L0 scatter (pallas):   '
              f'{timeit(scatter_pallas, mid, dst_sorted):8.3f} ms')
    print(f'L0 scatter (xla):      '
          f'{timeit(scatter_xla, mid, dst_sorted):8.3f} ms')
    print(f'L0 tp weight_numel={blk.conv_tp.weight_numel} '
          f'mid_dim={blk.conv_tp.irreps_out.dim} in={blk.conv_tp.irreps_in1.dim}')

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                params, opt_state, total = train_step(
                    params, opt_state, batch)
            jax.block_until_ready(total)
        print(f'trace written to {args.trace}')


if __name__ == '__main__':
    main()
