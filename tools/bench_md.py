"""MD benchmark on the real chip: the reference's md_serial_example
workload (96-atom HfO2 cell and its 2x2x2 = 768-atom replicate) driven
through Calculator + VelocityVerlet NVE (reference:
example_inputs/md_serial_example/in.lmp: pair_style e3gnn with the
deployed SevenNet-0, 5 NVE steps at 500 K, dt 2 fs).

Usage: python tools/bench_md.py [--steps 20] [--json OUT]

Reports steps/s and ms/step per system size plus an NVE energy-drift
check, writing experiments/md_tpu/RESULTS.json (the committed artifact
VERDICT r2 item 4 asked for -- the halo/MD path had never been timed on
TPU hardware).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RES_DAT = '/root/reference/example_inputs/md_serial_example/res.dat'


def read_lammps_data(path):
    """Minimal LAMMPS data reader for the example's triclinic cell."""
    from sevennet_finetuning_tpu.data.vasp import Structure

    with open(path) as f:
        lines = f.readlines()
    bounds = {}
    tilt = (0.0, 0.0, 0.0)
    n_atoms = 0
    atoms_at = None
    for i, ln in enumerate(lines):
        t = ln.split()
        if len(t) >= 2 and t[1] == 'atoms':
            n_atoms = int(t[0])
        elif 'xlo' in ln:
            bounds['x'] = (float(t[0]), float(t[1]))
        elif 'ylo' in ln:
            bounds['y'] = (float(t[0]), float(t[1]))
        elif 'zlo' in ln:
            bounds['z'] = (float(t[0]), float(t[1]))
        elif 'xy xz yz' in ln:
            tilt = (float(t[0]), float(t[1]), float(t[2]))
        elif ln.strip() == 'Atoms':
            atoms_at = i + 2
    xy, xz, yz = tilt
    cell = np.array([
        [bounds['x'][1] - bounds['x'][0], 0, 0],
        [xy, bounds['y'][1] - bounds['y'][0], 0],
        [xz, yz, bounds['z'][1] - bounds['z'][0]],
    ])
    type_to_sym = {1: 'Hf', 2: 'O'}   # Masses block: 178.49, 16.0
    species, pos = [], []
    for ln in lines[atoms_at:atoms_at + n_atoms]:
        t = ln.split()
        species.append(type_to_sym[int(t[1])])
        pos.append([float(x) for x in t[2:5]])
    return Structure(species=species, pos=np.array(pos), cell=cell)


def replicate(s, nx, ny, nz):
    from sevennet_finetuning_tpu.data.vasp import Structure

    species, pos = [], []
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                off = ix * s.cell[0] + iy * s.cell[1] + iz * s.cell[2]
                species.extend(s.species)
                pos.append(s.pos + off)
    return Structure(
        species=species, pos=np.concatenate(pos),
        cell=s.cell * np.array([[nx], [ny], [nz]]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--out', default='experiments/md_tpu/RESULTS.json')
    ap.add_argument('--model', default=None,
                    help='checkpoint/deployed path; default: the '
                         'reference deployed_serial.pt (SevenNet-0)')
    args = ap.parse_args()

    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from sevennet_finetuning_tpu.calculator import Calculator
    from sevennet_finetuning_tpu.md import VelocityVerlet

    if args.model:
        calc = Calculator.from_checkpoint(args.model)
    else:
        # the SevenNet-0 release serial artifact (the example dir's
        # deployed_serial.pt is the tiny channel-4 training example)
        from sevennet_finetuning_tpu.compat.known_models import (
            SEVENNET_0_11JULY2024,
        )

        calc = Calculator.from_deployed_torchscript(
            '/root/reference/sevenn/pretrained_potentials/'
            'SevenNet_0__11July2024/serial_model/deployed_serial.pt',
            SEVENNET_0_11JULY2024,
        )

    base = read_lammps_data(RES_DAT)
    systems = {
        '96_atom': base,
        '768_atom_2x2x2': replicate(base, 2, 2, 2),
    }

    results = {'device': str(jax.devices()[0]),
               'model': args.model or 'SevenNet-0 deployed_serial.pt',
               'workload': 'md_serial_example HfO2 NVE, dt=2fs, T0=500K',
               'systems': {}}
    for name, s in systems.items():
        # device-loop NVE (md.run_device): the whole multi-step segment
        # is one lax.scan on chip; host fetches once per segment
        md = VelocityVerlet(s, calculator=calc, dt_fs=2.0)
        md.set_temperature(500.0, seed=1)
        t0 = time.time()
        # warmup covers compile AND thermal equilibration of the edge
        # capacity: the t=0 neighbor count underestimates the heated
        # system's, and a capacity-bucket growth means one (persistent-
        # cached) recompile -- a once-per-trajectory cost that a 60-step
        # window must not be charged for.  Warm until the capacity has
        # been stable for a full window (capped at 5 windows).
        md.run_device(max(30, args.steps // 2), seg_steps=args.steps)
        stable = 0
        for _ in range(8):
            cap = md._cap_edge
            md.run_device(30, seg_steps=args.steps)
            stable = stable + 1 if md._cap_edge == cap else 0
            if stable >= 2:
                break
        warm_s = time.time() - t0
        t0 = time.time()
        md.run_device(args.steps, seg_steps=args.steps)
        dt = (time.time() - t0) / args.steps
        r = md.result
        e_tot = np.array(r.total)
        drift = float(abs(e_tot[-1] - e_tot[0]) / len(s))

        # host-loop comparison point (one fetch per step, the mode a
        # LAMMPS-style external driver would impose)
        md2 = VelocityVerlet(s, calculator=calc, dt_fs=2.0)
        md2.set_temperature(500.0, seed=1)
        md2.run(1)
        t0 = time.time()
        md2.run(5)
        dt_host = (time.time() - t0) / 5

        results['systems'][name] = {
            'n_atoms': len(s),
            'ms_per_md_step': round(dt * 1e3, 2),
            'md_steps_per_s': round(1.0 / dt, 2),
            'atom_steps_per_s': round(len(s) / dt, 1),
            'ms_per_md_step_host_loop': round(dt_host * 1e3, 2),
            'warmup_s': round(warm_s, 1),
            'nve_drift_ev_per_atom_over_run': drift,
            'final_T_K': round(r.temperatures[-1], 1),
        }
        print(f'{name}: {dt * 1e3:.2f} ms/step device-loop '
              f'({len(s) / dt:,.0f} atom*steps/s), '
              f'{dt_host * 1e3:.2f} ms/step host-loop, '
              f'drift {drift:.2e} eV/atom', flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
