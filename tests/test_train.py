import numpy as np
import pytest

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.dataset import GraphDataset, Loader
from sevennet_finetuning_tpu.data.elements import type_map_from_species
from sevennet_finetuning_tpu.data.vasp import read_structure_list
from sevennet_finetuning_tpu.model.build import build_model_spec
from sevennet_finetuning_tpu.model.nequip import init_params
from sevennet_finetuning_tpu.train.trainer import Trainer

REF_SLIST = '/root/reference/example_inputs/training/structure_list'


@pytest.fixture(scope='module')
def setup():
    d = read_structure_list(REF_SLIST)
    structs = [s for v in d.values() for s in v][:8]
    tm = type_map_from_species(
        {sp for s in structs for sp in s.species}
    )
    cutoff = 4.0
    ds = GraphDataset.from_structures(structs, cutoff, tm)
    cfg = {
        K.NUM_SPECIES: len(tm),
        K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4,
        K.LMAX: 1,
        K.NUM_CONVOLUTION: 2,
        K.CUTOFF: cutoff,
        K.IS_PARITY: False,
        K.CONV_DENOMINATOR: ds.avg_num_neigh(),
        K.SHIFT: ds.per_atom_energy_mean(),
        K.SCALE: ds.force_rms(),
        K.IS_TRAIN_STRESS: True,
        K.OPTIMIZER: 'adam',
        K.OPTIM_PARAM: {'lr': 0.005},
        K.SCHEDULER: 'exponentiallr',
        K.SCHEDULER_PARAM: {'gamma': 0.9},
        K.FORCE_WEIGHT: 0.1,
        K.STRESS_WEIGHT: 1e-6,
        K.ERROR_RECORD: [
            ['Energy', 'RMSE'], ['Force', 'RMSE'], ['Stress', 'RMSE'],
            ['Energy', 'MAE'], ['TotalLoss', 'None'],
        ],
    }
    return ds, cfg


def test_training_reduces_loss(setup):
    ds, cfg = setup
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    trainer = Trainer(spec, params, cfg)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=0)

    first = trainer.run_one_epoch(loader, is_train=True)
    for _ in range(5):
        last = trainer.run_one_epoch(loader, is_train=True)
        trainer.scheduler_step()
    assert last['TotalLoss_None'] < first['TotalLoss_None']
    assert np.isfinite(last['Energy_RMSE'])
    assert np.isfinite(last['Force_RMSE'])
    assert np.isfinite(last['Stress_RMSE'])
    assert last['Energy_MAE'] <= last['Energy_RMSE'] + 1e-9


def test_eval_does_not_change_params(setup):
    import jax

    ds, cfg = setup
    spec = build_model_spec(cfg)
    params = init_params(spec, 1)
    trainer = Trainer(spec, params, cfg)
    loader = Loader(ds, batch_size=4)
    before = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer.run_one_epoch(loader, is_train=False)
    after = jax.tree_util.tree_map(np.asarray, trainer.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(a, b)


def test_scheduler_updates_lr(setup):
    ds, cfg = setup
    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, 0), cfg)
    lr0 = trainer.get_lr()
    trainer.scheduler_step()
    assert trainer.get_lr() == pytest.approx(lr0 * 0.9)


def test_checkpoint_roundtrip(tmp_path, setup):
    import jax

    ds, cfg = setup
    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, 0), cfg)
    loader = Loader(ds, batch_size=4)
    trainer.run_one_epoch(loader, is_train=True)

    from sevennet_finetuning_tpu.train.checkpoint import (
        model_from_checkpoint,
        save_checkpoint,
    )

    path = str(tmp_path / 'ckpt.pkl')
    save_checkpoint(path, trainer.params, cfg, epoch=1)
    spec2, params2, cfg2 = model_from_checkpoint(path)
    assert spec2 == spec
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(trainer.params)),
        jax.tree_util.tree_leaves(params2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fisher_computation(setup):
    import jax

    ds, cfg = setup
    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, 0), cfg)
    loader = Loader(ds, batch_size=1)
    fisher, opt_params, count = trainer.compute_fisher_matrix(loader)
    assert count == len(ds)
    leaves = jax.tree_util.tree_leaves(fisher)
    assert all(np.isfinite(l).all() and (l >= 0).all() for l in leaves)
    assert any(np.abs(l).max() > 0 for l in leaves)
    # loss threshold 0 skips every sample
    fisher0, _, count0 = trainer.compute_fisher_matrix(loader, loss_thr=1e-12)
    assert count0 == 0


def test_ewc_loss_pulls_toward_anchor(setup):
    import jax

    ds, cfg = setup
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    t0 = Trainer(spec, params, cfg)
    loader = Loader(ds, batch_size=1)
    fisher, opt_params, _ = t0.compute_fisher_matrix(loader)

    cfg_ewc = dict(cfg)
    cfg_ewc[K.CONTINUE] = {
        K.FISHER: 'x', K.OPT_PARAMS: 'x', K.EWC_LAMBDA: 1e8,
    }
    cfg_ewc[K.ERROR_RECORD] = cfg[K.ERROR_RECORD] + [['EWCLoss', 'None']]
    trainer = Trainer(spec, params, cfg_ewc, fisher=fisher,
                      opt_params=opt_params)
    metrics = trainer.run_one_epoch(Loader(ds, batch_size=4), is_train=True)
    assert 'EWC' in str(metrics.keys())
    # huge lambda keeps params glued to the anchor
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(trainer.params)),
        jax.tree_util.tree_leaves(opt_params),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 0.05


def test_rehearsal_interleaves_memory(setup):
    ds, cfg = setup
    train_ds = GraphDataset(ds.graphs[:5])
    mem_ds = GraphDataset(ds.graphs[5:])
    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, 0), cfg)
    m_train, m_mem = trainer.run_one_epoch_rehearsal(
        Loader(train_ds, batch_size=2),
        Loader(mem_ds, batch_size=2),
        is_train=True,
    )
    assert np.isfinite(m_train['TotalLoss_None'])
    assert np.isfinite(m_mem['TotalLoss_None'])


def test_scheduler_step_does_not_retrace(setup):
    """set_lr must keep the hyperparam leaf's dtype/weak-type stable:
    a changed leaf type would recompile the whole train step every
    LR change (a 1-8 min stall per epoch at SevenNet-0 scale)."""
    ds, cfg = setup
    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, 0), cfg)
    loader = Loader(ds, batch_size=4)
    for _ in range(3):
        trainer.run_one_epoch(loader, is_train=True)
        trainer.scheduler_step()
    assert trainer._train_step._cache_size() == 1
