"""Checkpoint save/load (reference: sevenn/scripts/processing_epoch.py:34-44,
sevenn/util.py:95-231).

A checkpoint is one pickle holding numpy-converted params, optimizer and
scheduler state, the full config, and the epoch -- the same single-file
contract the reference uses (model rebuildable from config alone, the
checkpoint doubling as the deployment source).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(
    path: str,
    params,
    config: Dict,
    epoch: int = 0,
    optimizer_state=None,
    scheduler_state: Optional[Dict] = None,
):
    blob = {
        'model_state_dict': _to_numpy(jax.device_get(params)),
        'config': config,
        'epoch': epoch,
        'scheduler_state_dict': scheduler_state,
    }
    # optimizer state contains optax structures; store numpy-converted
    if optimizer_state is not None:
        blob['optimizer_state_dict'] = _to_numpy(
            jax.device_get(optimizer_state)
        )
    with open(path, 'wb') as f:
        pickle.dump(blob, f)


def load_checkpoint(path: str) -> Dict:
    """Load a checkpoint -- ours (pickle) or a reference torch .pth.

    Reference training checkpoints (torch.save zip archives, reference:
    sevenn/train/trainer.py:98-107) are detected by magic bytes and
    translated through the state-dict importer, so
    ``continue: checkpoint: <reference .pth>`` works unchanged."""
    with open(path, 'rb') as f:
        magic = f.read(2)
    if magic == b'PK':
        # npz (our deploy artifact) and torch archives are both zips
        import zipfile

        with zipfile.ZipFile(path) as zf:
            is_deployed = '__format__.npy' in zf.namelist()
        if is_deployed:
            params, config = load_deployed(path)
            return {
                'model_state_dict': params,
                'config': config,
                'epoch': 0,
                'optimizer_state_dict': None,
                'scheduler_state_dict': None,
            }
        from ..compat.state_dict_import import import_reference_checkpoint

        _, params, config, epoch = import_reference_checkpoint(path)
        return {
            'model_state_dict': params,
            'config': config,
            'epoch': epoch,
            'optimizer_state_dict': None,
            'scheduler_state_dict': None,
        }
    with open(path, 'rb') as f:
        return pickle.load(f)


def model_from_checkpoint(path: str):
    """Rebuild (spec, params, config) from a checkpoint file."""
    from ..model.build import build_model_spec

    blob = load_checkpoint(path)
    config = blob['config']
    spec = build_model_spec(config)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x), blob['model_state_dict']
    )
    return spec, params, config


def save_deployed(path: str, params, config: Dict):
    """Write a deployment artifact: a single npz of named float arrays
    plus the JSON-encoded config -- self-describing and safe to share
    (no pickle; the reference's counterpart is the frozen TorchScript
    with _extra_files metadata, reference: sevenn/scripts/deploy.py:34-51).

    Layout: '<group>/<param>' arrays + '__config__' (JSON bytes) +
    '__format__' (version tag)."""
    import json

    flat = {}
    for group, sub in _to_numpy(jax.device_get(params)).items():
        if isinstance(sub, dict):
            for name, arr in sub.items():
                flat[f'{group}/{name}'] = np.asarray(arr)
        else:
            flat[group] = np.asarray(sub)

    def _jsonable(v):
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
        if isinstance(v, np.ndarray):
            return v.tolist()
        raise TypeError(f'config value not serializable: {type(v)}')

    cfg = json.dumps(config, default=_jsonable)
    flat['__config__'] = np.frombuffer(cfg.encode(), dtype=np.uint8)
    flat['__format__'] = np.frombuffer(b'sevenn-ft-tpu-deploy-v1',
                                       dtype=np.uint8)
    with open(path, 'wb') as f:
        np.savez(f, **flat)


def load_deployed(path: str) -> Tuple[Dict, Dict]:
    """(params, config) from a deployment artifact.  Pickle-free."""
    import json

    with np.load(path, allow_pickle=False) as z:
        tag = bytes(z['__format__']).decode()
        if not tag.startswith('sevenn-ft-tpu-deploy'):
            raise ValueError(f'{path}: not a deployment artifact ({tag})')
        config = json.loads(bytes(z['__config__']).decode())
        params: Dict = {}
        for key in z.files:
            if key.startswith('__'):
                continue
            group, _, name = key.partition('/')
            if name:
                params.setdefault(group, {})[name] = z[key]
            else:
                params[group] = z[key]
    # JSON stringifies the int keys of the type map
    from .. import keys as K

    if config.get(K.TYPE_MAP):
        config[K.TYPE_MAP] = {
            int(k): int(v) for k, v in config[K.TYPE_MAP].items()
        }
    return params, config


def model_from_deployed(path: str):
    """Rebuild (spec, params, config) from a deployment artifact."""
    from ..model.build import build_model_spec

    params, config = load_deployed(path)
    return build_model_spec(config), params, config


def save_pytree(path: str, tree):
    """Fisher / optimal-params artifacts (reference writes
    fisher_sevenn.pt / opt_params_sevenn.pt)."""
    with open(path, 'wb') as f:
        pickle.dump(_to_numpy(tree), f)


def load_pytree(path: str):
    with open(path, 'rb') as f:
        return pickle.load(f)
