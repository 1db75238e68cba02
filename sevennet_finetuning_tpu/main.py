"""Command-line entry points.

Counterpart of the reference CLI family (reference: sevenn/main/*.py):

    python -m sevennet_finetuning_tpu.main train input.yaml [-w dir]
    python -m sevennet_finetuning_tpu.main train input.yaml --calc-fisher
    python -m sevennet_finetuning_tpu.main preset <name>
    python -m sevennet_finetuning_tpu.main inference <checkpoint> <data...>
    python -m sevennet_finetuning_tpu.main graph_build <structure_list> <cutoff>
"""

from __future__ import annotations

import argparse
import os
import sys


def cmd_train(args):
    from . import keys as K
    from .config import global_config, read_config_yaml
    from .pipeline import train

    model, tr, data = read_config_yaml(args.input)
    cfg = global_config(model, tr, data)
    if args.calc_fisher:
        # Fisher mode: no rehearsal, batch 1, and no EWC term (the Fisher
        # artifacts are being produced, not consumed)
        # (reference: sevenn/main/sevenn.py:74-81)
        cfg[K.CALC_FISHER] = True
        cfg[K.REHEARSAL] = False
        cfg[K.BATCH_SIZE] = 1
        cont = dict(cfg.get(K.CONTINUE) or {})
        cont[K.FISHER] = False
        cont[K.OPT_PARAMS] = False
        cfg[K.CONTINUE] = cont
    # dataset paths are relative to the yaml's directory
    base = os.path.dirname(os.path.abspath(args.input))
    for k in (K.LOAD_DATASET, K.LOAD_VALIDSET, K.LOAD_MEMORY):
        if cfg.get(k):
            cfg[k] = [
                p if os.path.isabs(p) else os.path.join(base, p)
                for p in cfg[k]
            ]
    train(cfg, working_dir=args.working_dir)


def cmd_preset(args):
    here = os.path.join(os.path.dirname(__file__), 'presets')
    path = os.path.join(here, f'{args.name}.yaml')
    if not os.path.exists(path):
        names = sorted(
            f[:-5] for f in os.listdir(here) if f.endswith('.yaml')
        )
        sys.exit(f'unknown preset {args.name!r}; available: {names}')
    with open(path) as f:
        sys.stdout.write(f.read())


def cmd_inference(args):
    from .scripts.inference import inference_main

    inference_main(args.checkpoint, args.data, output_dir=args.output,
                   batch_size=args.batch)


def cmd_graph_build(args):
    from . import keys as K
    from .data.dataset import GraphDataset
    from .data.vasp import read_structure_list
    from .data.elements import type_map_from_species
    import pickle

    grouped = read_structure_list(args.source)
    structs = [s for v in grouped.values() for s in v]
    tm = type_map_from_species({sp for s in structs for sp in s.species})
    ds = GraphDataset.from_structures(structs, args.cutoff, tm)
    out = args.output or 'graph_built.sevenn_data'
    with open(out, 'wb') as f:
        pickle.dump({'graphs': ds.graphs, 'cutoff': args.cutoff,
                     'type_map': tm}, f)
    print(f'saved {len(ds)} graphs to {out}')


def main(argv=None):
    p = argparse.ArgumentParser(prog='sevennet-ft-tpu')
    sub = p.add_subparsers(dest='cmd', required=True)

    t = sub.add_parser('train', help='train or fine-tune a potential')
    t.add_argument('input', help='input.yaml')
    t.add_argument('-w', '--working-dir', default='.')
    t.add_argument('-fs', '--calc-fisher', action='store_true',
                   help='estimate Fisher information then exit')
    t.set_defaults(func=cmd_train)

    pr = sub.add_parser('preset', help='print a preset input yaml')
    pr.add_argument('name')
    pr.set_defaults(func=cmd_preset)

    inf = sub.add_parser('inference', help='batch inference on structures')
    inf.add_argument('checkpoint')
    inf.add_argument('data', nargs='+')
    inf.add_argument('-o', '--output', default='sevenn_infer_result')
    inf.add_argument('-b', '--batch', type=int, default=5)
    inf.set_defaults(func=cmd_inference)

    g = sub.add_parser('graph_build', help='prebuild graphs from data')
    g.add_argument('source')
    g.add_argument('cutoff', type=float)
    g.add_argument('-o', '--output')
    g.set_defaults(func=cmd_graph_build)

    args = p.parse_args(argv)
    args.func(args)


if __name__ == '__main__':
    main()
