"""Single-process interleaved A/B of the aggregation paths on the chip.

Round-2 verdict: the Pallas sorted-segment-sum and the XLA scatter-add
were benchmarked in separate processes on different days and the ranking
flipped between sessions.  This tool compiles BOTH paths in one process
(via ops.pallas_scatter.force_impl) and interleaves timed rounds, so the
comparison shares chip/clock state; medians over rounds are robust to
transient tunnel noise.

Usage: python tools/ab_aggregation.py [--rounds 5] [--steps 30] [--json]

Measures
  - the full fine-tune train step (bench.py workload) per path,
  - the L0-shaped aggregation op alone per variant (xla, pallas@highest,
    pallas@high, pallas@default).
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_workload():
    import jax.numpy as jnp

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
    loss_fn = build_loss_fn(loss_specs_from_config(cfg))
    tx, _ = build_optimizer(cfg, trainable_mask(spec, params))
    return (spec, params, batch, loss_fn, tx,
            dict(n_node=n_node, n_edge=n_edge, n_edges_real=n_edges_real))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rounds', type=int, default=5)
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--json', action='store_true')
    args = ap.parse_args()

    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from sevennet_finetuning_tpu.model.nequip import apply_model
    from sevennet_finetuning_tpu.ops import pallas_scatter as ps

    spec, params, batch, loss_fn, tx, dims = make_workload()
    opt_state = tx.init(params)

    # device-resident train state: the timed loop must not re-transfer
    # params/opt_state from host every step (3.4MB H2D through the axon
    # tunnel costs ~170 ms/step and swamps the measurement)
    params = jax.device_put(params)
    opt_state = jax.device_put(opt_state)
    jax.block_until_ready((params, opt_state))

    def make_step(impl, mode):
        @jax.jit
        def step(p, o, b):
            def lfn(pp):
                out = apply_model(spec, pp, b, remat='auto')
                return loss_fn(pp, out)[0]
            total, grads = jax.value_and_grad(lfn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, total

        # trace+compile under the forced impl (dispatch is trace-time);
        # the kernel matmul mode is read from env at trace time.
        # CRITICAL: no device->host fetch here -- the axon tunnel's
        # first data fetch permanently degrades dispatch ~180x (the
        # round-2/3 A/B contradiction); losses are returned as device
        # scalars and fetched only after ALL timing is done.
        prev = os.environ.get('SEVENN_SCATTER_PRECISION')
        if mode is not None:
            os.environ['SEVENN_SCATTER_PRECISION'] = mode
        try:
            with ps.force_impl(impl):
                t0 = time.time()
                out = jax.block_until_ready(
                    step(params, opt_state, batch))
                compile_s = time.time() - t0
        finally:
            if prev is None:
                os.environ.pop('SEVENN_SCATTER_PRECISION', None)
            else:
                os.environ['SEVENN_SCATTER_PRECISION'] = prev
        return step, compile_s, out[2]

    steps = {}
    losses = {}
    for name, impl, mode in (
        ('pallas_bf16x2', 'pallas', 'bf16x2'),
        ('pallas_highest', 'pallas', 'highest'),
        ('xla', 'xla', None),
    ):
        steps[name], compile_s, losses[name] = make_step(impl, mode)
        print(f'# compiled {name}: {compile_s:.1f}s', file=sys.stderr)

    # interleaved timed rounds.  CRITICAL (PROFILE.md): on this runtime
    # block_until_ready does NOT synchronize -- only a data FETCH forces
    # execution -- so each timed window ends in a scalar loss fetch
    # (~35 ms, amortized over the window).  Executable switches cost a
    # ~1.7 s program reload; one warmup call (its fetch) absorbs it.
    times = {k: [] for k in steps}
    for r in range(args.rounds):
        for name, step in steps.items():
            p, o, t = step(params, opt_state, batch)
            float(t)  # absorb program reload + drain queue
            t0 = time.time()
            for _ in range(args.steps):
                p, o, t = step(p, o, batch)
            float(t)  # fetch forces execution of the whole window
            times[name].append((time.time() - t0) / args.steps * 1e3)
    med = {k: statistics.median(v) for k, v in times.items()}

    # aggregation op alone, L0 message shapes
    blk = spec.blocks[0]
    D = blk.conv_tp.irreps_out.dim
    E, N = dims['n_edge'], dims['n_node']
    rng = np.random.default_rng(0)
    from sevennet_finetuning_tpu import keys as K
    msg = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    dst = jnp.sort(batch[K.EDGE_IDX][1])

    variants = {
        'xla_sorted_hint': jax.jit(lambda m, d: jax.ops.segment_sum(
            m, d, num_segments=N, indices_are_sorted=True)),
        'pallas_bf16x2': jax.jit(lambda m, d: ps.segment_sum_sorted(
            m, d, N, precision='bf16x2')),
        'pallas_highest': jax.jit(lambda m, d: ps.segment_sum_sorted(
            m, d, N, precision='highest')),
        'pallas_bf16': jax.jit(lambda m, d: ps.segment_sum_sorted(
            m, d, N, precision='bf16')),
    }
    K_REP = 8

    def chained(fn):
        # K_REP data-dependent applications inside ONE executable,
        # reduced to a SCALAR in-jit so the terminal fetch (which is
        # what forces execution, PROFILE.md) transfers 4 bytes.  The
        # dependency multiplies by a runtime (1 + eps*0-valued) factor
        # so XLA cannot hoist the chain.
        @jax.jit
        def g(m, d):
            out = fn(m, d)
            for _ in range(K_REP - 1):
                out = fn(m * (1.0 + out[0, 0] * 1e-30), d)
            return out.astype(jnp.float32).sum()
        return g

    # time first, fetch LAST (fetch-poisoning, see above): variant
    # outputs are held as device arrays and compared after all timing
    op_ms = {}
    op_out = {}
    for name, fn in variants.items():
        op_out[name] = jax.block_until_ready(fn(msg, dst))
        g = chained(fn)
        float(g(msg, dst))  # compile + program load
        runs = []
        for r in range(args.rounds):
            t0 = time.time()
            v = float(g(msg, dst))   # fetch forces execution
            runs.append((time.time() - t0 - 0.035) / K_REP * 1e3)
        op_ms[name] = statistics.median(runs)

    # ---- all timing done; fetches are safe from here on ----
    ref = np.asarray(op_out['xla_sorted_hint'])
    op_err = {}
    for name, out in op_out.items():
        if name == 'xla_sorted_hint':
            continue
        op_err[name] = float(
            np.abs(np.asarray(out) - ref).max() / np.abs(ref).max())
    loss_vals = {k: float(v) for k, v in losses.items()}
    print(f'# losses: {loss_vals}', file=sys.stderr)
    assert len({round(v, 5) for v in loss_vals.values()}) == 1, (
        f'impl disagreement: {loss_vals}')

    hbm_bytes = msg.size * 4 + np.asarray(ref).size * 4 + E * 4
    result = {
        'train_step_ms': {k: round(v, 3) for k, v in med.items()},
        'train_step_all_rounds_ms': {
            k: [round(x, 3) for x in v] for k, v in times.items()},
        'agg_op_ms': {k: round(v, 4) for k, v in op_ms.items()},
        'agg_op_max_rel_err_vs_xla': {
            k: f'{v:.2e}' for k, v in op_err.items()},
        'agg_op_shape': [E, D, N],
        'agg_op_hbm_roofline_ms': round(hbm_bytes / 819e9 * 1e3, 4),
        'winner_step': min(med, key=med.get),
    }
    print(json.dumps(result, indent=None if args.json else 2))


if __name__ == '__main__':
    main()
