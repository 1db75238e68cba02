"""Stage 0: align the shipped example data to SevenNet-0's energy reference.

The golden reEWC curves (reference:
example_inputs/fine_tuning/FT_w_reEWC/log.csv) were produced on
train/valid/replay .sevenn_data files that are NOT shipped; the OUTCARs the
reference does ship (example_inputs/data/label_{1,2}) use a DFT energy
reference ~18.9 eV/atom away from SevenNet-0's MPTrj-consistent species
shifts.  The reference's own committed log shows the same phenomenon: its
first continuation segments start at Valid E MAE ~4 eV/atom and the
successful final segment starts already aligned at 0.030 (log.csv rows 2-13
vs 15-25).  EWC correctly pins the shift parameters near their Fisher
optimum, so the offset cannot (and should not) be trained away.

This script reproduces the aligned situation: ridge-fit per-species energy
deltas between the shipped labels and SevenNet-0 predictions over
label_1+label_2 (the same species-wise linear model the dataset statistics
use, reference: sevenn/train/dataset.py:279-309), subtract them from the
labels, and write aligned extxyz files.  Forces and stress are untouched
(they are reference-independent).

Run from this directory:  python prep_align.py
Outputs: data/ft.extxyz (label_1), data/replay.extxyz (label_2)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache

enable_persistent_cache()

from sevennet_finetuning_tpu.calculator import Calculator
from sevennet_finetuning_tpu.compat.known_models import (
    pretrained_name_to_path,
)
from sevennet_finetuning_tpu.data.readers import write_extxyz
from sevennet_finetuning_tpu.data.vasp import read_outcar


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    ref = '/root/reference/example_inputs/data'
    calc = Calculator.from_checkpoint(pretrained_name_to_path('SevenNet-0'))

    groups = {}
    for label in ('label_1', 'label_2'):
        structs = []
        import glob

        for path in sorted(glob.glob(f'{ref}/{label}/OUTCAR_*')):
            structs.extend(read_outcar(path))
        groups[label] = structs

    # ridge fit of label - prediction on per-structure species counts
    species = sorted({sp for ss in groups.values() for s in ss
                      for sp in s.species})
    rows, resid = [], []
    for ss in groups.values():
        for s in ss:
            pred = float(calc.calculate(s)['energy'])
            rows.append([s.species.count(sp) for sp in species])
            resid.append(s.energy - pred)
    A = np.asarray(rows, float)
    b = np.asarray(resid, float)
    lam = 0.1
    delta = np.linalg.solve(A.T @ A + lam * np.eye(len(species)), A.T @ b)
    print('species deltas (eV/atom):',
          {sp: round(float(d), 4) for sp, d in zip(species, delta)})

    os.makedirs(os.path.join(here, 'data'), exist_ok=True)
    outs = {'label_1': 'ft.extxyz', 'label_2': 'replay.extxyz'}
    for label, fname in outs.items():
        aligned = []
        for s in groups[label]:
            corr = sum(c * d for c, d in zip(
                [s.species.count(sp) for sp in species], delta))
            s.energy = float(s.energy - corr)
            aligned.append(s)
        out = os.path.join(here, 'data', fname)
        write_extxyz(out, aligned)
        res = [abs(s.energy - float(calc.calculate(s)['energy'])) / len(s)
               for s in aligned]
        print(f'{out}: {len(aligned)} structures, '
              f'post-align per-atom |E err| mean '
              f'{float(np.mean(res)):.4f} eV/atom')


if __name__ == '__main__':
    main()
