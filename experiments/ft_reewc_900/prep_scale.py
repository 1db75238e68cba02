"""Stage 0: build a reference-scale reEWC workload.

The reference's golden FT_w_reEWC run trains on ~900 structures plus a
~900-structure replay memory at batch 8 and logs 40-45 s/epoch on one
CUDA GPU (reference: example_inputs/fine_tuning/FT_w_reEWC/
log.sevenn:291-381).  Its .sevenn_data files are not shipped, so this
builds a same-SIZE workload from the energy-aligned example frames
(../ft_reewc/data, produced by ../ft_reewc/prep_align.py): each frame is
replicated 180x with a tiny (5e-4 A) random displacement so every graph
is distinct.  Labels: the energy gets the exact first-order correction
E += F . dx (forces are known), leaving only O(|dx|^2) error
(~1e-6 eV/atom); the frozen FORCE labels carry ~|H.dx| ~ 5-25 meV/A of
noise -- far below the golden-run band (Valid F MAE <= 0.06 eV/A).
(Round 5 lesson: the original 0.005 A displacement put the force-label
noise floor at ~0.1 eV/A, ABOVE the band -- the archived
conv_out_noisy_labels run converged exactly onto that floor.)

Run from this directory:  python prep_scale.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..', '..')))

from sevennet_finetuning_tpu.data.readers import (  # noqa: E402
    read_extxyz,
    write_extxyz,
)
from sevennet_finetuning_tpu.data.vasp import Structure  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, '..', 'ft_reewc', 'data')
N_TARGET = 900
SIGMA = 0.0005  # Angstrom


def scale_up(frames, n_target, seed):
    rng = np.random.default_rng(seed)
    out = []
    reps = (n_target + len(frames) - 1) // len(frames)
    for r in range(reps):
        for s in frames:
            if len(out) == n_target:
                break
            disp = rng.normal(0.0, SIGMA, np.asarray(s.pos).shape) \
                if r > 0 else np.zeros_like(np.asarray(s.pos))
            e = s.energy
            if e is not None and s.forces is not None:
                # first-order (exact-in-F) energy correction:
                # E(x+dx) = E(x) - F . dx + O(|dx|^2)
                e = float(e) - float(np.sum(np.asarray(s.forces) * disp))
            out.append(Structure(
                species=list(s.species),
                pos=np.asarray(s.pos) + disp,
                cell=np.asarray(s.cell),
                pbc=s.pbc,
                energy=e,
                forces=None if s.forces is None else np.asarray(s.forces),
                stress=None if s.stress is None else np.asarray(s.stress),
            ))
    return out


def main():
    for name, seed in (('ft', 10), ('replay', 11)):
        frames = read_extxyz(os.path.join(SRC, f'{name}.extxyz'))
        big = scale_up(frames, N_TARGET, seed)
        dst = os.path.join(HERE, 'data', f'{name}900.extxyz')
        write_extxyz(dst, big)
        print(f'{dst}: {len(big)} frames from {len(frames)}')


if __name__ == '__main__':
    main()
