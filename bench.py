"""Benchmark: fine-tune training throughput (edges/s/chip) on the
reEWC workload -- FETCH-FORCED (honest) timing.

Workload mirrors the reference's reEWC fine-tune setting (reference:
example_inputs/fine_tuning/FT_w_reEWC/input_full.yaml): SevenNet-0
architecture (843k params, lmax 2, 5 layers, cutoff 5.0), 96-atom HfO2
structures, batch 8, full energy/force/stress loss, adam update.

Timing methodology (round 3, see PROFILE.md): on this runtime
``jax.block_until_ready`` does NOT wait for execution -- work queues
until the first device->host DATA fetch, so any timing that does not end
in a fetch measures dispatch only (rounds 1-2 did exactly that and
recorded fiction).  Every timed region here is a single compiled
``lax.scan`` over N steps whose result is FETCHED (a scalar, ~35 ms
round-trip, amortized over N).  A dense bf16 matmul control ran at
~197 TFLOP/s under this same harness, validating both the chip and the
methodology.

Baseline: the reference logs ~40-45 s/epoch for 900 train + 900 replay
structures at batch 8 on one CUDA GPU (reference:
example_inputs/fine_tuning/FT_w_reEWC/log.sevenn:291-381) -> ~226
optimizer steps / 42 s = 0.186 s/step INCLUDING its input pipeline.
vs_baseline compares the fetch-forced epoch-level throughput (which
includes our input pipeline) against that rate.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import statistics
import time

import numpy as np


def main():
    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from sevennet_finetuning_tpu import keys as K
    from sevennet_finetuning_tpu.compat.known_models import (
        SEVENNET_0_11JULY2024,
    )
    from sevennet_finetuning_tpu.data.dataset import GraphDataset, Loader
    from sevennet_finetuning_tpu.data.elements import type_map_from_species
    from sevennet_finetuning_tpu.data.vasp import read_outcar
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.graph import structure_to_graph
    from sevennet_finetuning_tpu.model.nequip import (
        apply_model,
        init_params,
        trainable_mask,
    )
    from sevennet_finetuning_tpu.ops import pallas_scatter as ps
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
            structs.extend(
                read_outcar(
                    f'/root/reference/example_inputs/data/label_{lbl}'
                    f'/OUTCAR_{idx}'
                )
            )
    tm = type_map_from_species({sp for s in structs for sp in s.species})

    cfg = dict(SEVENNET_0_11JULY2024)
    cfg.update({
        K.NUM_SPECIES: len(tm),
        K.TYPE_MAP: tm,
        K.CUTOFF: CUTOFF,
        K.SHIFT: [-5.0] * len(tm),
        K.SCALE: [1.0] * len(tm),
        K.CONV_DENOMINATOR: 36.0,
        K.IS_TRAIN_STRESS: True,
        K.OPTIMIZER: 'adam',
        K.OPTIM_PARAM: {'lr': 1e-4},
        K.LOSS: 'huber',
        K.LOSS_PARAM: {'delta': 0.01},
        K.FORCE_WEIGHT: 1.0,
        K.STRESS_WEIGHT: 0.01,
        K.ERROR_RECORD: [['Energy', 'RMSE'], ['Force', 'RMSE'],
                         ['TotalLoss', 'None']],
    })
    spec = build_model_spec(cfg)
    params = jax.device_put(init_params(spec, seed=0))

    graphs = [structure_to_graph(s, CUTOFF, tm) for s in structs]
    ds = GraphDataset(graphs * 12)   # 120 structures
    loader = Loader(ds, BATCH, shuffle=True, seed=0, cache=True)
    t0 = time.time()
    host_batches = loader.materialize()
    collate_s = time.time() - t0
    fullest = max(host_batches, key=lambda b: b[K.EDGE_MASK].sum())
    n_edges_real = int(fullest[K.EDGE_MASK].sum())
    batch = {
        k: jnp.asarray(v) for k, v in fullest.items()
        if k not in (K.INFO, K.USER_LABEL)
    }

    loss_fn = build_loss_fn(loss_specs_from_config(cfg))
    tx, _ = build_optimizer(cfg, trainable_mask(spec, params))
    opt_state = jax.device_put(tx.init(params))

    import optax

    # chip + methodology control: dense bf16 matmul inside the same
    # scan-and-fetch harness must land near the v5e peak (197 TFLOP/s)
    M, REP = 4096, 50
    A = jnp.ones((M, M), jnp.bfloat16)

    @jax.jit
    def control(a, b):
        def body(c, _):
            c = jax.lax.dot(c, b, preferred_element_type=jnp.bfloat16)
            return c * (1.0 / M), None
        c, _ = jax.lax.scan(body, a, None, length=REP)
        return c.astype(jnp.float32).sum()

    float(control(A, A))
    t0 = time.time()
    float(control(A, A))
    control_tflops = REP * 2 * M**3 / (time.time() - t0) / 1e12

    N_STEPS = 20

    def make_scan_steps(fused_conv):
        # the A/B axis is the round-4 fused quadrilinear convolution
        # (Pallas kernels for every AD mode of the CG TP) vs the round-3
        # per-instruction chain; both ride the sorted-scatter kernel
        import os

        os.environ['SEVENN_FUSED_CONV'] = '1' if fused_conv else '0'

        def one_step(p, o, t):
            def lfn(pp):
                out = apply_model(spec, pp, batch, remat='auto')
                total, _ = loss_fn(pp, out)
                return total
            total, grads = jax.value_and_grad(lfn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, total

        @jax.jit
        def scan_steps(p, o):
            def body(carry, _):
                p, o, t = carry
                return one_step(p, o, t), None
            (p, o, t), _ = jax.lax.scan(
                body, (p, o, jnp.zeros(())), None, length=N_STEPS)
            return t

        t0 = time.time()
        loss = float(scan_steps(params, opt_state))  # compile+run
        compile_s = time.time() - t0
        return scan_steps, compile_s, loss

    def time_scan(fn, rounds=3):
        ts = []
        for _ in range(rounds):
            t0 = time.time()
            float(fn(params, opt_state))   # fetch forces execution
            ts.append(time.time() - t0)
        return statistics.median(ts) / N_STEPS

    scan_old, compile_s, loss_xla = make_scan_steps(False)
    scan_fused, _, loss_pal = make_scan_steps(True)
    dt_xla = time_scan(scan_old)
    dt_pal = time_scan(scan_fused)
    dt = min(dt_xla, dt_pal)

    # epoch-level throughput INCLUDING the input pipeline and the
    # per-epoch metric fetch, through the REAL Trainer scanned-epoch
    # path (run_one_epoch with fetch=True ends in a device_get, which
    # forces execution -- the honest epoch a user sees)
    from sevennet_finetuning_tpu.train.trainer import Trainer

    trainer = Trainer(spec, init_params(spec, seed=0), cfg)
    t0 = time.time()
    trainer.run_one_epoch(loader, is_train=True, fetch=True)
    cold_s = collate_s + (time.time() - t0)  # H2D + epoch compile, once

    n_epoch_edges = sum(
        int(b[K.EDGE_MASK].sum()) for b in loader.materialize())
    epoch_runs = []
    metrics = None
    for _ in range(3):
        t0 = time.time()
        metrics = trainer.run_one_epoch(loader, is_train=True, fetch=True)
        epoch_runs.append(time.time() - t0)
    epoch_s = statistics.median(epoch_runs)
    epoch_edges_per_s = n_epoch_edges / epoch_s

    edges_per_s = n_edges_real / dt
    ref_edges_per_s = n_edges_real / 0.186
    print(json.dumps({
        'metric': 'edges_per_s_per_chip_finetune_epoch',
        'value': round(epoch_edges_per_s, 1),
        'unit': 'edges/s/chip',
        'vs_baseline': round(epoch_edges_per_s / ref_edges_per_s, 4),
        'detail': {
            'device': str(jax.devices()[0]),
            'timing': 'fetch-forced scans (see PROFILE.md); '
                      'block_until_ready does not sync on this runtime',
            'control_bf16_matmul_tflops': round(control_tflops, 1),
            'step_ms_round3_chain': round(dt_xla * 1e3, 2),
            'step_ms_fused_conv': round(dt_pal * 1e3, 2),
            'instep_edges_per_s_best': round(edges_per_s, 1),
            'epoch_s_120_structs_with_metric_fetch': round(epoch_s, 3),
            'epoch_cold_s_collate_h2d_compile': round(cold_s, 1),
            'compile_s': round(compile_s, 1),
            'edges_per_batch': int(n_edges_real),
            'batch': BATCH,
            'loss_after_timing': float(loss_xla),
            'train_metrics_last_epoch': metrics,
            'profile': 'PROFILE.md',
        },
    }))


if __name__ == '__main__':
    main()
