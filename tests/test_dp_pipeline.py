"""Data-parallel training wired through the REAL pipeline.

Covers the reference's DDP path semantics (reference:
sevenn/main/sevenn.py:39-50, sevenn/scripts/train.py:22-44,
sevenn/error_recorder.py:70-77): sharded loader, dp train/eval steps,
in-jit metric reduction.  The equivalence oracle is single-device
training on the same global batch.
"""

import csv
import os

import jax
import numpy as np
import pytest

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.dataset import GraphDataset, Loader
from sevennet_finetuning_tpu.data.elements import z_to_symbol
from sevennet_finetuning_tpu.data.vasp import Structure
from sevennet_finetuning_tpu.pipeline import train


def _structures(n, n_atoms=10, seed=0):
    rng = np.random.default_rng(seed)
    zs = [8, 72]
    out = []
    for _ in range(n):
        cell = np.eye(3) * max(4.0, (n_atoms / 0.05) ** (1.0 / 3.0))
        out.append(Structure(
            species=[z_to_symbol(int(rng.choice(zs)))
                     for _ in range(n_atoms)],
            pos=rng.uniform(0, cell[0, 0], (n_atoms, 3)),
            cell=cell,
            energy=float(-5.0 * n_atoms + rng.normal()),
            forces=rng.normal(size=(n_atoms, 3)),
            stress=rng.normal(size=6) * 0.01,
        ))
    return out


def _config(**over):
    cfg = {
        K.NODE_FEATURE_MULTIPLICITY: 8,
        K.LMAX: 1,
        K.NUM_CONVOLUTION: 2,
        K.CUTOFF: 4.5,
        K.IS_PARITY: False,
        K.SELF_CONNECTION_TYPE: 'linear',
        K.CONV_DENOMINATOR: 'avg_num_neigh',
        K.SHIFT: 'per_atom_energy_mean',
        K.SCALE: 'force_rms',
        K.IS_TRAIN_STRESS: True,
        K.OPTIMIZER: 'adam',
        K.OPTIM_PARAM: {'lr': 1e-3},
        K.FORCE_WEIGHT: 0.1,
        K.STRESS_WEIGHT: 1e-6,
        K.EPOCH: 2,
        K.PER_EPOCH: 0,
        K.TRAIN_SHUFFLE: False,
        K.RANDOM_SEED: 1,
        K.RATIO: 0.5,
        K.CHEMICAL_SPECIES: 'Auto',
        K.REMAT: False,
    }
    cfg.update(over)
    return cfg


def test_loader_sharding_shapes_and_cycling():
    structs = _structures(6, n_atoms=8, seed=3)
    ds = GraphDataset.from_structures(structs, 4.5, {8: 0, 72: 1})
    loader = Loader(ds, batch_size=1, n_shards=4)
    batches = list(loader)
    # 6 graphs / (1*4) -> 2 global steps, tail cycled from the front
    assert len(batches) == 2 == len(loader)
    for b in batches:
        assert b[K.POS].shape[0] == 4
        assert b[K.POS].ndim == 3
        assert b[K.EDGE_IDX].shape[:2] == (4, 2)


def test_loader_local_shard_slice():
    """Multi-process emulation: a process holding shards [2, 4) collates
    exactly that slice of the global order."""
    structs = _structures(8, n_atoms=8, seed=4)
    ds = GraphDataset.from_structures(structs, 4.5, {8: 0, 72: 1})
    full = Loader(ds, batch_size=1, n_shards=4)
    part = Loader(ds, batch_size=1, n_shards=4, n_local_shards=2,
                  shard_offset=2)
    for fb, pb in zip(full, part):
        assert pb[K.POS].shape[0] == 2
        np.testing.assert_array_equal(fb[K.POS][2:4], pb[K.POS])


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_dp_training_matches_single_device(tmp_path):
    """Same 8-graph global batch: 8-way dp vs single-device training must
    produce the same loss curve and the same final parameters."""
    structs = _structures(16, n_atoms=10, seed=0)

    wd1 = tmp_path / 'single'
    t1 = train(_config(**{K.BATCH_SIZE: 8}), working_dir=str(wd1),
               structures=list(structs))

    wd8 = tmp_path / 'dp8'
    t8 = train(_config(**{K.BATCH_SIZE: 1, K.IS_DDP: True}),
               working_dir=str(wd8), structures=list(structs))
    assert t8.dp and not t1.dp

    def read_csv(path):
        with open(path) as f:
            return list(csv.DictReader(f))

    rows1 = read_csv(wd1 / 'log.csv')
    rows8 = read_csv(wd8 / 'log.csv')
    assert len(rows1) == len(rows8) == 2
    for r1, r8 in zip(rows1, rows8):
        for col in r1:
            if col in ('epoch', 'lr'):
                continue
            v1, v8 = float(r1[col]), float(r8[col])
            assert v1 == pytest.approx(v8, rel=2e-3, abs=1e-6), (
                f'{col}: single {v1} vs dp {v8}'
            )

    p1 = jax.device_get(t1.params)
    p8 = jax.device_get(t8.params)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            leaf, flat8[path], rtol=2e-3, atol=2e-5,
            err_msg=str(path),
        )


@pytest.mark.skipif(jax.device_count() < 8, reason='needs 8 devices')
def test_dp_rehearsal_epoch_runs(tmp_path):
    """Rehearsal (interleaved memory steps) under data parallelism."""
    structs = _structures(16, n_atoms=8, seed=1)
    mem = _structures(8, n_atoms=8, seed=2)

    cfg = _config(**{
        K.BATCH_SIZE: 1, K.IS_DDP: True, K.EPOCH: 1,
        K.REHEARSAL: True, K.MEM_BATCH_SIZE: 1, K.MEM_RATIO: 1.0,
    })
    # memory structures injected through the loader path requires files;
    # drive the trainer directly instead
    from sevennet_finetuning_tpu.model.build import build_model_spec
    from sevennet_finetuning_tpu.model.nequip import init_params
    from sevennet_finetuning_tpu.parallel.data_parallel import make_mesh
    from sevennet_finetuning_tpu.pipeline import (
        resolve_statistics,
        setup_species,
    )
    from sevennet_finetuning_tpu.train.trainer import Trainer
    from sevennet_finetuning_tpu.logger import Logger

    setup_species(cfg, structs)
    tm = cfg[K.TYPE_MAP]
    train_set = GraphDataset.from_structures(structs, cfg[K.CUTOFF], tm)
    mem_set = GraphDataset.from_structures(mem, cfg[K.CUTOFF], tm)
    resolve_statistics(cfg, train_set, Logger(os.devnull))

    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, seed=0), cfg,
                      mesh=make_mesh(8))
    tl = Loader(train_set, 1, n_shards=8)
    ml = Loader(mem_set, 1, n_shards=8)
    m_train, m_mem = trainer.run_one_epoch_rehearsal(tl, ml, is_train=True)
    for v in list(m_train.values()) + list(m_mem.values()):
        assert np.isfinite(v)
