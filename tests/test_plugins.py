"""Plugin hooks: custom interaction block and custom loss
(reference: sevenn/model_build.py:92-100, sevenn/train/loss.py:312-321).
"""

import os
import textwrap

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

PLUGIN_SRC = '''
import jax.numpy as jnp
import numpy as np

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.model.nequip import CustomBlockSpec
from sevennet_finetuning_tpu.ops.linear import (
    apply_linear, init_linear_weights, linear_spec,
)


def build_block(t, irreps_x, irreps_filter, irreps_out, num_species,
                radial_hidden, bessel_num, config):
    """A minimal valid block: linear mix + mean-aggregated messages."""
    lin = linear_spec(irreps_x, irreps_out)

    def init(rng):
        return {f'w{i}': w
                for i, w in enumerate(init_linear_weights(lin, rng))}

    def apply(params, x, ctx):
        import jax

        h = apply_linear(
            lin, [params[f'w{i}'] for i in range(len(params))], x
        )
        x_all = h if ctx['exchange_fn'] is None else ctx['exchange_fn'](h)
        agg = jax.ops.segment_sum(
            x_all[ctx['edge_src']] * ctx['emb'][:, :1],
            ctx['edge_dst'], num_segments=ctx['n_node'],
        )
        return h + agg / 10.0

    return CustomBlockSpec(t=t, irreps_x=irreps_x, irreps_out=irreps_out,
                           init=init, apply=apply)


def build_losses(config):
    def energy_mse(params, out):
        n = jnp.maximum(out[K.NUM_ATOMS], 1).astype(jnp.float32)
        mask = jnp.isfinite(out[K.ENERGY]) & (out[K.NUM_ATOMS] > 0)
        err = (out[K.PRED_TOTAL_ENERGY] / n
               - jnp.where(mask, out[K.ENERGY], 0.0) / n) ** 2
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1)

    def l2_reg(params, out):
        import jax

        return sum(jnp.sum(w ** 2)
                   for w in jax.tree_util.tree_leaves(params)) * 0.0

    return [('Energy', 1.0, energy_mse), ('Reg', 1e-8, l2_reg)]
'''


@pytest.fixture(scope='module')
def plugin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('plugins')
    (d / 'my_plugin.py').write_text(textwrap.dedent(PLUGIN_SRC))
    return str(d)


@pytest.fixture(scope='module')
def data():
    d = read_structure_list(REF_SLIST)
    structs = [s for v in d.values() for s in v][:6]
    tm = type_map_from_species({sp for s in structs for sp in s.species})
    return GraphDataset.from_structures(structs, 4.0, tm), tm


def _base_cfg(tm):
    return {
        K.NUM_SPECIES: len(tm), K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4, K.LMAX: 1, K.NUM_CONVOLUTION: 2,
        K.CUTOFF: 4.0, K.IS_PARITY: False, K.CONV_DENOMINATOR: 10.0,
        K.SHIFT: -4.0, K.SCALE: 1.5,
        K.OPTIMIZER: 'adam', K.OPTIM_PARAM: {'lr': 0.005},
        K.ERROR_RECORD: [['Energy', 'MAE'], ['TotalLoss', 'None']],
    }


def test_custom_interaction_block_trains(plugin_dir, data):
    ds, tm = data
    cfg = _base_cfg(tm)
    cfg[K.INTERACTION_TYPE] = 'custom'
    cfg[K._CUSTOM_INTERACTION_BLOCK_CALLBACK] = {
        'path': plugin_dir, 'module': 'my_plugin',
        'function': 'build_block',
    }
    spec = build_model_spec(cfg)
    assert all(b.block_type == 'custom' for b in spec.blocks)
    params = init_params(spec, 0)
    assert '0_custom_block' in params
    trainer = Trainer(spec, params, cfg)
    loader = Loader(ds, batch_size=3)
    first = trainer.run_one_epoch(loader, is_train=True)
    for _ in range(4):
        last = trainer.run_one_epoch(loader, is_train=True)
    assert np.isfinite(last['TotalLoss_None'])
    assert last['TotalLoss_None'] < first['TotalLoss_None']


def test_custom_loss_trains(plugin_dir, data):
    ds, tm = data
    cfg = _base_cfg(tm)
    cfg[K.LOSS] = 'custom'
    cfg[K.LOSS_PARAM] = {'path': plugin_dir, 'module': 'my_plugin',
                         'function': 'build_losses'}
    spec = build_model_spec(cfg)
    trainer = Trainer(spec, init_params(spec, 0), cfg)
    assert [ls.name for ls in trainer.loss_specs] == ['Energy', 'Reg']
    loader = Loader(ds, batch_size=3)
    first = trainer.run_one_epoch(loader, is_train=True)
    for _ in range(4):
        last = trainer.run_one_epoch(loader, is_train=True)
    assert last['TotalLoss_None'] < first['TotalLoss_None']
