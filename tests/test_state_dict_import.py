"""Reference .pth / state-dict import (compat/state_dict_import.py).

Covers VERDICT item 4: the reference fine-tunes *from a training
checkpoint* (reference: sevenn/util.py:95-183); these tests prove the
state-dict route recovers bit-identical parameters and that
``continue: checkpoint: <.pth>`` drives the real pipeline.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

from sevennet_finetuning_tpu import keys as K  # noqa: E402
from sevennet_finetuning_tpu.compat.state_dict_import import (  # noqa: E402
    import_reference_checkpoint,
    params_from_state_dict,
    state_dict_from_params,
)
from sevennet_finetuning_tpu.model.build import build_model_spec  # noqa: E402
from sevennet_finetuning_tpu.model.nequip import init_params  # noqa: E402

REF = '/root/reference'
OPT_PARAMS = (f'{REF}/example_inputs/fine_tuning/estimate_Fisher/'
              'opt_params_sevenn.pt')
SEVENNET0_TS = (f'{REF}/sevenn/pretrained_potentials/'
                'SevenNet_0__11July2024/serial_model/deployed_serial.pt')


def _small_config(**over):
    cfg = {
        K.NUM_SPECIES: 3,
        K.TYPE_MAP: {8: 0, 72: 1, 1: 2},
        K.NODE_FEATURE_MULTIPLICITY: 4,
        K.LMAX: 2,
        K.NUM_CONVOLUTION: 2,
        K.CUTOFF: 4.0,
        K.IS_PARITY: True,
        K.CONV_DENOMINATOR: [7.0, 9.0],
        K.SHIFT: -1.5,
        K.SCALE: 2.0,
        K.SELF_CONNECTION_TYPE: 'nequip',
    }
    cfg.update(over)
    return cfg


@pytest.mark.parametrize('over', [
    {},
    {K.SELF_CONNECTION_TYPE: 'linear', K.IS_PARITY: False},
    {K.USE_BIAS_IN_LINEAR: True},
    {K.READOUT_AS_FCN: True, K.READOUT_FCN_HIDDEN_NEURONS: [10, 10]},
    {K.SHIFT: [0.1, 0.2, 0.3], K.SCALE: [1.0, 2.0, 3.0]},
])
def test_state_dict_round_trip(over):
    spec = build_model_spec(_small_config(**over))
    params = init_params(spec, seed=3)
    sd = state_dict_from_params(spec, params)
    back = params_from_state_dict(spec, sd, strict=True)
    la, ta = jax.tree_util.tree_flatten(params)
    lb, tb = jax.tree_util.tree_flatten(back)
    assert ta == tb
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strict_rejects_unknown_and_wrong_size():
    spec = build_model_spec(_small_config())
    params = init_params(spec, seed=0)
    sd = state_dict_from_params(spec, params)
    sd['bogus.layer.weight'] = np.zeros(3, np.float32)
    with pytest.raises(RuntimeError, match='bogus'):
        params_from_state_dict(spec, sd, strict=True)
    del sd['bogus.layer.weight']
    sd['0_self_interaction_1.linear.weight'] = np.zeros(7, np.float32)
    with pytest.raises(ValueError, match='architecture config mismatch'):
        params_from_state_dict(spec, sd, strict=True)


def test_reference_checkpoint_dict_import(tmp_path):
    """A fabricated reference-layout .pth (torch.save of
    {'model_state_dict', 'config', 'epoch'}) imports losslessly."""
    cfg = _small_config()
    spec = build_model_spec(cfg)
    params = init_params(spec, seed=11)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in state_dict_from_params(spec, params).items()}
    path = str(tmp_path / 'checkpoint_5.pth')
    torch.save(
        {'model_state_dict': sd, 'config': cfg, 'epoch': 5,
         'optimizer_state_dict': {}, 'scheduler_state_dict': {}},
        path,
    )
    spec2, params2, config2, epoch = import_reference_checkpoint(path)
    assert epoch == 5
    la, ta = jax.tree_util.tree_flatten(params)
    lb, tb = jax.tree_util.tree_flatten(params2)
    assert ta == tb
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # statistics surfaced into the config from the state dict
    assert config2[K.CONV_DENOMINATOR] == [7.0, 9.0]
    assert config2[K.SHIFT] == pytest.approx(-1.5)


@pytest.mark.skipif(not os.path.exists(OPT_PARAMS),
                    reason='reference artifacts not present')
def test_sevennet0_opt_params_matches_torchscript_import():
    """opt_params_sevenn.pt is SevenNet-0's theta* from the Fisher run
    (never trained past it) -- the state-dict import of it must agree
    with the frozen-TorchScript import parameter-for-parameter."""
    from sevennet_finetuning_tpu.compat.known_models import (
        SEVENNET_0_11JULY2024,
    )
    from sevennet_finetuning_tpu.compat.torchscript_import import (
        import_deployed_serial,
    )

    if not os.path.exists(SEVENNET0_TS):
        pytest.skip('SevenNet-0 artifact not present')
    spec_ts, params_ts, meta, config = import_deployed_serial(
        SEVENNET0_TS, SEVENNET_0_11JULY2024
    )
    spec_sd, params_sd, _, _ = import_reference_checkpoint(
        OPT_PARAMS, config_overrides=config
    )
    la, ta = jax.tree_util.tree_flatten(params_ts)
    lb, tb = jax.tree_util.tree_flatten(params_sd)
    assert ta == tb
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6,
            err_msg='TorchScript vs state-dict import disagree',
        )


@pytest.mark.skipif(not os.path.exists(SEVENNET0_TS),
                    reason='reference artifacts not present')
def test_frozen_torchscript_route_via_load_checkpoint():
    """load_checkpoint transparently consumes a frozen deployed .pt."""
    from sevennet_finetuning_tpu.train.checkpoint import load_checkpoint

    blob = load_checkpoint(SEVENNET0_TS)
    assert 'rescale_atomic_energy' in blob['model_state_dict']
    cfg = blob['config']
    assert cfg[K.NUM_SPECIES] == 89
    assert len(cfg[K.CONV_DENOMINATOR]) == 5
    assert isinstance(cfg[K.SHIFT], list) and len(cfg[K.SHIFT]) == 89


def test_pipeline_continues_from_reference_pth(tmp_path):
    """continue: checkpoint: <reference .pth> flows through
    pipeline.train(): architecture + weights + statistics come from the
    checkpoint (reference: sevenn/scripts/processing_continue.py)."""
    from sevennet_finetuning_tpu.data.vasp import read_structure_list
    from sevennet_finetuning_tpu.pipeline import train

    d = read_structure_list(
        f'{REF}/example_inputs/training/structure_list'
    )
    structs = [s for v in d.values() for s in v][:6]
    from sevennet_finetuning_tpu.data.elements import (
        type_map_from_species,
    )

    tm = type_map_from_species({sp for s in structs for sp in s.species})

    cfg = _small_config(**{
        K.TYPE_MAP: tm, K.NUM_SPECIES: len(tm),
        K.SELF_CONNECTION_TYPE: 'linear',
    })
    spec = build_model_spec(cfg)
    params = init_params(spec, seed=7)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in state_dict_from_params(spec, params).items()}
    cp = str(tmp_path / 'ref_checkpoint.pth')
    torch.save({'model_state_dict': sd, 'config': cfg, 'epoch': 42}, cp)

    run_cfg = {
        K.CONTINUE: {K.CHECKPOINT: cp, K.RESET_OPTIMIZER: True,
                     K.RESET_SCHEDULER: True,
                     K.USE_STATISTIC_VALUES_OF_CHECKPOINT: True},
        K.CUTOFF: 4.0,
        K.EPOCH: 1, K.PER_EPOCH: 1,
        K.BATCH_SIZE: 2, K.RATIO: 0.34,
        K.OPTIMIZER: 'adam', K.OPTIM_PARAM: {'lr': 1e-12},
        K.ERROR_RECORD: [['Energy', 'MAE'], ['TotalLoss', 'None']],
    }
    trainer = train(run_cfg, working_dir=str(tmp_path / 'run'),
                    structures=structs)
    # near-zero LR: trained params stay at the imported checkpoint values
    got = np.asarray(
        trainer.params['rescale_atomic_energy']['shift']
    ).reshape(-1)
    want = np.asarray(params['rescale_atomic_energy']['shift']).reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    w_got = np.asarray(trainer.params['0_self_interaction_1']['w0'])
    w_want = np.asarray(params['0_self_interaction_1']['w0'])
    np.testing.assert_allclose(w_got, w_want, atol=1e-5)
    assert os.path.exists(tmp_path / 'run' / 'log.csv')
