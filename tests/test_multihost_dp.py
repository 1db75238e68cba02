"""True multi-process data-parallel training smoke test.

Launches TWO separate Python processes coordinated through
``jax.distributed.initialize`` (each with 2 virtual CPU devices -> a
4-device global mesh) and runs the REAL ``pipeline.train`` epoch loop
with ``is_ddp`` on both ranks.  This exercises the multi-host code the
single-process suite cannot: cross-process device enumeration, the
``make_array_from_process_local_data`` batch assembly, sharded-loader
rank offsets, and rank-0-only logging (reference analogue: torch DDP
over NCCL, reference: sevenn/main/sevenn.py:39-50,
sevenn/scripts/train.py:22-44).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r'''
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.vasp import Structure
from sevennet_finetuning_tpu.pipeline import train

rng = np.random.default_rng(0)
structs = []
for i in range(8):
    n = 8
    structs.append(Structure(
        species=['O' if k % 2 else 'Si' for k in range(n)],
        pos=rng.uniform(0, 6.0, (n, 3)),
        cell=np.eye(3) * 6.0,
        energy=-5.0 * n + rng.normal() * 0.1,
        forces=rng.normal(size=(n, 3)) * 0.1,
    ))

cfg = {
    K.CHEMICAL_SPECIES: 'auto',
    K.CUTOFF: 3.0,
    K.NODE_FEATURE_MULTIPLICITY: 4,
    K.LMAX: 1,
    K.NUM_CONVOLUTION: 2,
    K.IS_PARITY: True,
    K.EPOCH: 2,
    K.PER_EPOCH: 1,
    K.BATCH_SIZE: 2,
    K.RATIO: 0.25,
    K.IS_TRAIN_STRESS: False,
    K.OPTIMIZER: 'adam',
    K.OPTIM_PARAM: {'lr': 1e-3},
    K.IS_DDP: True,
    K.ERROR_RECORD: [['Energy', 'MAE'], ['TotalLoss', 'None']],
}
wd = sys.argv[3] + '/shared'  # SAME dir on both ranks: rank-0-only writes
trainer = train(cfg, working_dir=wd, structures=structs)
assert trainer.dp, 'expected the data-parallel trainer path'
print('RANK', sys.argv[2], 'FINAL_PARAM_SUM',
      float(sum(np.abs(np.asarray(x)).sum()
                for x in jax.tree_util.tree_leaves(trainer.params))))
'''


def test_two_process_dp_training(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    coord = f'localhost:{port}'

    script = tmp_path / 'worker.py'
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(rank), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out[-3000:]}'

    # both ranks end with identical parameters (grads all-reduced)
    sums = []
    for out in outs:
        line = [ln for ln in out.splitlines() if 'FINAL_PARAM_SUM' in ln][-1]
        sums.append(float(line.split()[-1]))
    np.testing.assert_allclose(sums[0], sums[1], rtol=1e-6)

    # rank 0 wrote the artifacts into the shared dir without collision
    shared = tmp_path / 'shared'
    assert (shared / 'log.csv').exists()
    assert (shared / 'log.sevenn').exists()
    assert (shared / 'checkpoint_2.pth').exists()
