"""End-to-end pipeline/CLI smoke tests: YAML in -> artifacts out.

Covers VERDICT weak item 7 (pipeline/CLI layer untested) and item 6
(every interaction type trainable from a YAML file).  Mirrors the
reference's example-driven validation (reference:
example_inputs/training/input_full.yaml + sevenn/main/sevenn.py).
"""

import csv
import os
import textwrap

import pytest
import yaml

from sevennet_finetuning_tpu.main import main as cli_main

REF_DATA = '/root/reference/example_inputs/training/structure_list'


def _write_yaml(path, interaction='nequip', extra_model=None,
                extra_train=None, extra_data=None):
    model = {
        'chemical_species': 'auto',
        'cutoff': 4.0,
        'channel': 4,
        'lmax': 1,
        'num_convolution_layer': 2,
        'interaction_type': interaction,
        'is_parity': False,
    }
    train = {
        'random_seed': 1,
        'epoch': 2,
        'per_epoch': 2,
        'optimizer': 'adam',
        'optim_param': {'lr': 0.005},
        'scheduler': 'exponentiallr',
        'scheduler_param': {'gamma': 0.9},
        'error_record': [
            ['Energy', 'MAE'], ['Force', 'MAE'], ['TotalLoss', 'None'],
        ],
    }
    data = {
        'batch_size': 4,
        'data_divide_ratio': 0.3,
        'load_dataset_path': [REF_DATA],
    }
    model.update(extra_model or {})
    train.update(extra_train or {})
    data.update(extra_data or {})
    with open(path, 'w') as f:
        yaml.safe_dump({'model': model, 'train': train, 'data': data}, f)
    return path


@pytest.mark.parametrize('interaction', [
    'nequip', 'mace', 'gaunt', 'gaunt_gate',
])
def test_train_cli_smoke_all_interaction_types(tmp_path, interaction):
    """input.yaml -> main.py train -> log.csv + checkpoints, for every
    interaction family (reference: sevenn/model_build.py:303-352)."""
    y = _write_yaml(str(tmp_path / 'input.yaml'), interaction=interaction)
    wd = str(tmp_path / 'run')
    cli_main(['train', y, '-w', wd])

    assert os.path.exists(os.path.join(wd, 'log.sevenn'))
    csv_path = os.path.join(wd, 'log.csv')
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    for row in rows:
        for col in ('train_Energy_MAE', 'valid_Energy_MAE',
                    'train_TotalLoss_None'):
            assert float(row[col]) == float(row[col])  # parses, not NaN
    assert os.path.exists(os.path.join(wd, 'checkpoint_2.pth'))
    assert os.path.exists(os.path.join(wd, 'checkpoint_best.pth'))

    # the periodic checkpoint reloads and resumes (continue: path)
    y2 = _write_yaml(
        str(tmp_path / 'input2.yaml'), interaction=interaction,
        extra_train={'continue': {
            'checkpoint': os.path.join(wd, 'checkpoint_2.pth'),
            'reset_optimizer': True, 'reset_scheduler': True,
        }, 'epoch': 1},
    )
    wd2 = str(tmp_path / 'run2')
    cli_main(['train', y2, '-w', wd2])
    assert os.path.exists(os.path.join(wd2, 'log.csv'))


def test_fisher_then_ewc_cli(tmp_path):
    """-fs Fisher estimation, then an EWC fine-tune consuming the
    artifacts (reference: sevenn/main/sevenn.py:74-81 + scripts/train.py
    compute_fisher_information)."""
    y = _write_yaml(str(tmp_path / 'input.yaml'))
    wd = str(tmp_path / 'pretrain')
    cli_main(['train', y, '-w', wd])

    fis = str(tmp_path / 'fisher')
    y_fs = _write_yaml(
        str(tmp_path / 'input_fs.yaml'),
        extra_train={'continue': {
            'checkpoint': os.path.join(wd, 'checkpoint_2.pth'),
        }, 'loss_threshold': 1e9},
    )
    cli_main(['train', y_fs, '-w', fis, '-fs'])
    assert os.path.exists(os.path.join(fis, 'fisher_sevenn.pt'))
    assert os.path.exists(os.path.join(fis, 'opt_params_sevenn.pt'))

    wd2 = str(tmp_path / 'ft')
    y_ft = _write_yaml(
        str(tmp_path / 'input_ft.yaml'),
        extra_train={
            'continue': {
                'checkpoint': os.path.join(wd, 'checkpoint_2.pth'),
                'reset_optimizer': True, 'reset_scheduler': True,
                'reset_epoch': True,
                'fisher_information': os.path.join(fis,
                                                   'fisher_sevenn.pt'),
                'opt_params': os.path.join(fis, 'opt_params_sevenn.pt'),
                'ewc_lambda': 1e4,
            },
            'epoch': 1,
            'scheduler': 'cosineannealingwarmuplr',
            'scheduler_param': {
                'first_cycle_steps': 10, 'max_lr': 1e-3,
                'min_lr': 0.0, 'warmup_steps': 2,
            },
            'error_record': [
                ['Energy', 'MAE'], ['TotalLoss', 'None'],
                ['EWCLoss', 'None'],
            ],
        },
    )
    cli_main(['train', y_ft, '-w', wd2])
    with open(os.path.join(wd2, 'log.csv')) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    ewc_col = next(c for c in rows[0] if 'EWC' in c and 'train' in c)
    assert float(rows[0][ewc_col]) >= 0.0
    # warmup step 1 of the cosine schedule: lr = max_lr * 1/2 at epoch 1
    assert float(rows[0]['lr']) == pytest.approx(0.5e-3, rel=1e-6)


def test_preset_cli_prints_yaml(capsys):
    cli_main(['preset', 'fine_tune'])
    out = capsys.readouterr().out
    assert yaml.safe_load(out)  # parses


def test_continue_epoch_and_csv_continuation(tmp_path):
    """Epoch numbering and log.csv continue across runs; reset_epoch
    restarts; conflicting arch yaml keys are rejected (reference:
    sevenn/scripts/processing_continue.py:11-56,120-143)."""
    y = _write_yaml(str(tmp_path / 'input.yaml'))
    wd = str(tmp_path / 'run')
    cli_main(['train', y, '-w', wd])
    cp = os.path.join(wd, 'checkpoint_2.pth')

    # continue IN THE SAME DIR to epoch 4: rows 3,4 appended
    y2 = _write_yaml(
        str(tmp_path / 'input2.yaml'),
        extra_train={'continue': {'checkpoint': cp}, 'epoch': 4},
    )
    cli_main(['train', y2, '-w', wd])
    with open(os.path.join(wd, 'log.csv')) as f:
        rows = list(csv.DictReader(f))
    assert [r['epoch'] for r in rows] == ['1', '2', '3', '4']
    assert os.path.exists(os.path.join(wd, 'checkpoint_4.pth'))

    # reset_epoch: restart numbering at 1 (fresh csv in a new dir)
    y3 = _write_yaml(
        str(tmp_path / 'input3.yaml'),
        extra_train={'continue': {'checkpoint': cp, 'reset_epoch': True},
                     'epoch': 1},
    )
    wd3 = str(tmp_path / 'run3')
    cli_main(['train', y3, '-w', wd3])
    with open(os.path.join(wd3, 'log.csv')) as f:
        rows = list(csv.DictReader(f))
    assert [r['epoch'] for r in rows] == ['1']

    # conflicting architecture in the yaml -> hard error
    y4 = _write_yaml(
        str(tmp_path / 'input4.yaml'),
        extra_model={'channel': 16},
        extra_train={'continue': {'checkpoint': cp}},
    )
    with pytest.raises(ValueError, match='must match the checkpoint'):
        cli_main(['train', y4, '-w', str(tmp_path / 'run4')])

    # changing trainables without resetting optimizer -> hard error
    y5 = _write_yaml(
        str(tmp_path / 'input5.yaml'),
        extra_model={'train_shift_scale': True},
        extra_train={'continue': {'checkpoint': cp}},
    )
    with pytest.raises(ValueError, match='reset_optimizer'):
        cli_main(['train', y5, '-w', str(tmp_path / 'run5')])


def test_deploy_artifact_is_pickle_free(tmp_path):
    """get_model emits an npz+json artifact (no pickle anywhere) whose
    predictions match the source checkpoint (reference counterpart:
    TorchScript freeze + _extra_files, sevenn/scripts/deploy.py:15-51)."""
    import numpy as np

    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.data.vasp import read_outcar

    y = _write_yaml(str(tmp_path / 'input.yaml'))
    wd = str(tmp_path / 'run')
    cli_main(['train', y, '-w', wd])
    cp = os.path.join(wd, 'checkpoint_2.pth')
    art = str(tmp_path / 'deployed.sevenn')
    cli_main(['get_model', cp, '-o', art])

    # strictly pickle-free load
    with np.load(art, allow_pickle=False) as z:
        assert '__config__' in z.files
        assert any('/w0' in k for k in z.files)

    s = read_outcar(
        '/root/reference/example_inputs/data/label_1/OUTCAR_5'
    )[0]
    c1 = Calculator.from_checkpoint(cp)
    c2 = Calculator.from_deployed(art)
    r1 = c1.calculate(s)
    r2 = c2.calculate(s)
    np.testing.assert_allclose(r1['energy'], r2['energy'], rtol=1e-6)
    np.testing.assert_allclose(r1['forces'], r2['forces'], atol=1e-6)

    # deploy artifacts also feed continue: (fine-tune from deployed)
    y2 = _write_yaml(
        str(tmp_path / 'input2.yaml'),
        extra_train={'continue': {'checkpoint': art,
                                  'reset_epoch': True}, 'epoch': 1},
    )
    cli_main(['train', y2, '-w', str(tmp_path / 'run2')])
    assert os.path.exists(tmp_path / 'run2' / 'log.csv')


def test_inference_cli_writes_artifacts(tmp_path):
    """main.py train -> checkpoint -> main.py inference: errors.txt,
    info.csv, per_graph.csv, per_atom.csv all written and parseable
    (reference: sevenn/scripts/inference.py:185-291)."""
    import csv as _csv

    yml = tmp_path / 'in.yaml'
    yml.write_text(textwrap.dedent('''
        model:
            chemical_species: 'auto'
            cutoff: 4.0
            channel: 4
            lmax: 1
            num_convolution_layer: 2
        train:
            epoch: 1
            per_epoch: 1
            error_record:
                - ['Energy', 'MAE']
                - ['TotalLoss', 'None']
        data:
            batch_size: 2
            data_divide_ratio: 0.25
            load_dataset_path:
                - '/root/reference/example_inputs/data/label_1/OUTCAR_*'
    '''))
    run = tmp_path / 'run'
    cli_main(['train', str(yml), '-w', str(run)])
    ckpt = run / 'checkpoint_1.pth'
    assert ckpt.exists()

    out = tmp_path / 'infer'
    cli_main(['inference', str(ckpt),
          '/root/reference/example_inputs/data/label_2/OUTCAR_6',
          '-o', str(out)])
    for f in ('errors.txt', 'info.csv', 'per_graph.csv', 'per_atom.csv'):
        assert (out / f).exists(), f
    with open(out / 'per_graph.csv') as f:
        rows = list(_csv.DictReader(f))
    assert rows and 'energy' in rows[0] and 'ref_energy' in rows[0]
    with open(out / 'per_atom.csv') as f:
        arows = list(_csv.DictReader(f))
    assert arows and any('f' in k.lower() for k in arows[0])


def test_metrics_every_skips_fetch_epochs(tmp_path):
    """metrics_every=2: only epochs 2 and 4 (and the last) evaluate,
    fetch and log; intermediate epochs train without any device->host
    metric transfer."""
    import numpy as np

    from sevennet_finetuning_tpu import keys as K
    from sevennet_finetuning_tpu.data.vasp import Structure
    from sevennet_finetuning_tpu.pipeline import train

    rng = np.random.default_rng(0)
    structs = []
    for i in range(6):
        n = 6
        structs.append(Structure(
            species=['O' if k % 2 else 'Si' for k in range(n)],
            pos=rng.uniform(0, 6.0, (n, 3)),
            cell=np.eye(3) * 6.0,
            energy=-5.0 * n + rng.normal() * 0.1,
            forces=rng.normal(size=(n, 3)) * 0.1,
        ))
    cfg = {
        K.CHEMICAL_SPECIES: 'auto', K.CUTOFF: 3.0,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 1,
        K.NUM_CONVOLUTION: 2, K.IS_PARITY: False,
        K.EPOCH: 4, K.PER_EPOCH: 4, K.BATCH_SIZE: 2, K.RATIO: 0.34,
        K.IS_TRAIN_STRESS: False,
        K.OPTIMIZER: 'adam', K.OPTIM_PARAM: {'lr': 1e-3},
        K.ERROR_RECORD: [['Energy', 'MAE'], ['TotalLoss', 'None']],
        K.METRICS_EVERY: 2,
    }
    wd = str(tmp_path / 'run')
    train(cfg, working_dir=wd, structures=structs)
    with open(wd + '/log.csv') as f:
        lines = f.read().strip().splitlines()
    epochs = [int(ln.split(',')[0]) for ln in lines[1:]]
    assert epochs == [2, 4], epochs

    # plateau scheduler requires per-epoch metrics
    import pytest

    cfg2 = dict(cfg)
    cfg2[K.SCHEDULER] = 'reducelronplateau'
    with pytest.raises(ValueError, match='metrics_every'):
        train(cfg2, working_dir=str(tmp_path / 'run2'),
              structures=structs)
