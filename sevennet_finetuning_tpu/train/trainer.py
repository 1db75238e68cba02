"""Trainer: jitted train/eval steps, Fisher estimation, rehearsal.

JAX re-design of the reference trainer (reference:
sevenn/train/trainer.py:15-222).  One compiled step fuses forward (with
force/stress double-backprop), loss, gradients, the optax update and the
metric accumulator update.  Data parallelism (the reference's DDP/NCCL
path, reference: sevenn/train/trainer.py:17-28, sevenn/error_recorder.py:70-77)
shards a stacked batch over a device mesh: each device computes its
shard's loss/grads/metric partials, XLA's sharding propagation inserts
the all-reduces (grad mean, metric-accumulator sum) -- no framework-level
DDP hooks.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import keys as K
from ..model.nequip import ModelSpec, apply_model, trainable_mask
from ..parallel.data_parallel import DATA_AXIS
from .loss import LossSpec, build_loss_fn, loss_specs_from_config
from .metrics import (
    MetricSpec,
    finalize,
    init_accumulators,
    metric_specs_from_config,
    update_accumulators,
)
from .optim import build_optimizer, set_lr


def _device_batch(batch: Dict) -> Dict:
    return {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k not in (K.INFO, K.USER_LABEL)
    }


def _dp_update_acc(mspecs, acc, outs, termss, totals):
    """Add each shard's metric partials (computed from zero) to the
    running accumulators; the vmap-axis sum becomes a psum when the axis
    is sharded (reference's dist.all_reduce of sums/counts, reference:
    sevenn/error_recorder.py:70-77)."""
    def upd(out, terms, total):
        return update_accumulators(
            mspecs, init_accumulators(mspecs), out, terms, total
        )

    per_dev = jax.vmap(upd)(outs, termss, totals)
    return {k: acc[k] + jnp.sum(per_dev[k], axis=0) for k in acc}


class Trainer:
    """Owns params + optimizer state; steps are pure jitted functions."""

    def __init__(
        self,
        spec: ModelSpec,
        params,
        config: Dict,
        fisher=None,
        opt_params=None,
        mesh=None,
    ):
        self.spec = spec
        self.params = params
        self.config = config
        self.mesh = mesh

        self.loss_specs = loss_specs_from_config(config)
        self.metric_specs = metric_specs_from_config(config)
        self.loss_fn = build_loss_fn(
            self.loss_specs,
            use_data_weights=config.get(K.LOAD_DATASET_WITH_WEIGHTS, False),
            fisher=fisher,
            opt_params=opt_params,
        )

        self.remat = config.get(K.REMAT, 'auto')
        mask = trainable_mask(spec, params)
        self.tx, self.lr_controller = build_optimizer(config, mask)
        self.opt_state = self.tx.init(params)

        # data-parallel mode: a mesh with >1 device switches the train /
        # eval steps to stacked-batch variants sharded over DATA_AXIS
        self.dp = mesh is not None and mesh.devices.size > 1
        if self.dp:
            repl = NamedSharding(mesh, P())
            self._dp_sharding = NamedSharding(mesh, P(DATA_AXIS))
            self._train_step = jax.jit(
                self._make_dp_train_step(),
                in_shardings=(repl, repl, self._dp_sharding, repl),
                out_shardings=(repl, repl, repl),
            )
            self._eval_step = jax.jit(
                self._make_dp_eval_step(),
                in_shardings=(repl, self._dp_sharding, repl),
                out_shardings=(repl, None),
            )
        else:
            self._train_step = jax.jit(self._make_train_step())
            self._eval_step = jax.jit(self._make_eval_step())
        self._fisher_step = jax.jit(self._make_fisher_step())
        # device-resident batch cache per cache=True loader: batches are
        # H2D-transferred once and replayed every epoch (the loader only
        # supplies the shuffled visit order)
        self._dev_cache: Dict[int, list] = {}
        # stacked [n_batches, ...] pytrees for the scanned-epoch path
        self._stacked_cache: Dict[int, object] = {}
        if not self.dp:
            self._train_epoch = jax.jit(self._make_train_epoch())
            self._eval_epoch = jax.jit(self._make_eval_epoch())
            self._rehearsal_epoch = jax.jit(self._make_rehearsal_epoch())

    # -- step builders ----------------------------------------------------
    def _make_train_step(self, remat_scale: float = 1.0):
        spec, loss_fn, tx = self.spec, self.loss_fn, self.tx
        mspecs = self.metric_specs

        remat = self.remat
        if remat == 'auto' and remat_scale != 1.0:
            remat = ('auto', remat_scale)

        def step(params, opt_state, batch, acc):
            def lfn(p):
                out = apply_model(spec, p, batch, remat=remat)
                total, terms = loss_fn(p, out)
                return total, (out, terms)

            (total, (out, terms)), grads = jax.value_and_grad(
                lfn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = update_accumulators(mspecs, acc, out, terms, total)
            return params, opt_state, acc

        return step

    def _make_eval_step(self):
        spec, loss_fn = self.spec, self.loss_fn
        mspecs = self.metric_specs

        def step(params, batch, acc):
            out = apply_model(spec, params, batch)
            total, terms = loss_fn(params, out)
            acc = update_accumulators(mspecs, acc, out, terms, total)
            return acc, out

        return step

    def _make_dp_train_step(self):
        """Stacked-batch train step: vmap over the leading shard axis;
        grads are the mean of per-shard grads (DDP semantics) and metric
        accumulators add the sum of per-shard partials -- both reduce
        over the mesh via jit's sharding propagation."""
        spec, loss_fn, tx = self.spec, self.loss_fn, self.tx
        mspecs = self.metric_specs
        remat = self.remat

        def step(params, opt_state, stacked, acc):
            def lfn(p):
                def per_dev(b):
                    out = apply_model(spec, p, b, remat=remat)
                    total, terms = loss_fn(p, out)
                    return total, (out, terms)

                totals, (outs, termss) = jax.vmap(per_dev)(stacked)
                return jnp.mean(totals), (outs, termss, totals)

            (_, (outs, termss, totals)), grads = jax.value_and_grad(
                lfn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = _dp_update_acc(mspecs, acc, outs, termss, totals)
            return params, opt_state, acc

        return step

    def _make_dp_eval_step(self):
        spec, loss_fn = self.spec, self.loss_fn
        mspecs = self.metric_specs

        def step(params, stacked, acc):
            def per_dev(b):
                out = apply_model(spec, params, b)
                total, terms = loss_fn(params, out)
                return total, (out, terms)

            totals, (outs, termss) = jax.vmap(per_dev)(stacked)
            acc = _dp_update_acc(mspecs, acc, outs, termss, totals)
            return acc, outs

        return step

    @staticmethod
    def _index_batch(stacked, idx):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(
                x, idx, 0, keepdims=False),
            stacked,
        )

    def _make_train_epoch(self):
        """One WHOLE epoch as a single executable: lax.scan of the train
        step over device-resident stacked batches in the loader's
        shuffled order.  One dispatch per epoch instead of one per batch
        -- the TPU-native epoch loop (no reference counterpart: eager
        PyTorch dispatches per op)."""
        step = self._make_train_step()

        def epoch(params, opt_state, acc, stacked, order):
            def body(carry, idx):
                p, o, a = carry
                b = self._index_batch(stacked, idx)
                p, o, a = step(p, o, b, a)
                return (p, o, a), None

            (params, opt_state, acc), _ = jax.lax.scan(
                body, (params, opt_state, acc), order)
            return params, opt_state, acc

        return epoch

    def _make_eval_epoch(self):
        step = self._make_eval_step()

        def epoch(params, acc, stacked, order):
            def body(a, idx):
                a, _ = step(params, self._index_batch(stacked, idx), a)
                return a, None

            acc, _ = jax.lax.scan(body, acc, order)
            return acc

        return epoch

    def _make_rehearsal_epoch(self):
        """Scanned epoch with interleaved replay: after each train batch
        one optimizer step on the cycling memory batch (reference:
        sevenn/train/trainer.py:157-222).

        remat_scale=2.0: TWO double-backprop steps share the scan body
        and XLA's buffer liveness across them is conservative -- the
        'auto' remat estimate doubles so big workloads flip to
        checkpointing before they hit HBM capacity (a 900-structure
        rehearsal scan compiled to 21G/15.75G without it)."""
        step = self._make_train_step(remat_scale=2.0)

        def epoch(params, opt_state, acc, mem_acc,
                  stacked, order, mem_stacked, mem_order, i0):
            n_mem = mem_order.shape[0]

            def body(carry, i):
                p, o, a, ma = carry
                p, o, a = step(
                    p, o, self._index_batch(stacked, order[i]), a)
                p, o, ma = step(
                    p, o,
                    self._index_batch(
                        mem_stacked, mem_order[(i0 + i) % n_mem]),
                    ma,
                )
                return (p, o, a, ma), None

            (params, opt_state, acc, mem_acc), _ = jax.lax.scan(
                body, (params, opt_state, acc, mem_acc),
                jnp.arange(order.shape[0]))
            return params, opt_state, acc, mem_acc

        return epoch

    @staticmethod
    def _scan_chunk() -> int:
        """Max batches per scanned-epoch dispatch.

        The cap is a TUNNELED-RUNTIME workaround, active only on the
        'axon' platform: large single scans (~90 two-step rehearsal
        iterations) reliably fault that tunnel's TPU worker, so the
        per-executable scan length is bounded there at negligible
        dispatch cost (PROFILE.md).  Standard PJRT runtimes (direct TPU,
        CPU, GPU) get the unchunked large-scan path automatically.
        Override either way with SEVENN_EPOCH_SCAN_CHUNK."""
        import os

        env = os.environ.get('SEVENN_EPOCH_SCAN_CHUNK')
        if env is not None:
            return max(1, int(env))
        # the axon PJRT plugin masquerades as 'tpu' in jax; its presence
        # shows in JAX_PLATFORMS (set by that environment's tooling)
        if 'axon' in os.environ.get('JAX_PLATFORMS', ''):
            return 48
        return 10 ** 9

    def _stacked_for(self, loader):
        """[n_batches, ...] device pytree of a cache=True loader's
        materialized batches (built once per loader)."""
        key = id(loader)
        if key not in self._stacked_cache:
            dev = [self._place_batch(b) for b in loader.materialize()]
            self._stacked_cache[key] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *dev)
        return self._stacked_cache[key]

    def _make_fisher_step(self):
        spec, loss_fn = self.spec, self.loss_fn

        remat = self.remat

        def step(params, batch, fisher_acc, count, loss_thr):
            def lfn(p):
                out = apply_model(spec, p, batch, remat=remat)
                total, _ = loss_fn(p, out)
                return total

            total, grads = jax.value_and_grad(lfn)(params)
            take = jnp.where(loss_thr < 0, 1.0, (total < loss_thr) * 1.0)
            fisher_acc = jax.tree_util.tree_map(
                lambda f, g: f + take * g * g, fisher_acc, grads
            )
            return fisher_acc, count + take

        return step

    # -- batch placement --------------------------------------------------
    def _place_batch(self, batch: Dict) -> Dict:
        """Host batch -> device arrays; in dp mode the stacked leading
        axis is sharded over the mesh (multi-process runs assemble the
        global array from each process's local shards)."""
        if not self.dp:
            return _device_batch(batch)
        batch = {
            k: v for k, v in batch.items()
            if k not in (K.INFO, K.USER_LABEL)
        }
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self._dp_sharding, np.asarray(x)
                ),
                batch,
            )
        return jax.device_put(batch, self._dp_sharding)

    def _epoch_batches(self, loader: Iterable[Dict]) -> Iterable[Dict]:
        """Device batches for one epoch.  cache=True loaders get their
        materialized batches placed on device ONCE and replayed in the
        loader's per-epoch order; others place on the fly."""
        if getattr(loader, 'cache', False):
            key = id(loader)
            if key not in self._dev_cache:
                self._dev_cache[key] = [
                    self._place_batch(b) for b in loader.materialize()
                ]
            dev = self._dev_cache[key]
            return (dev[i] for i in loader.epoch_order())
        return (self._place_batch(b) for b in loader)

    # -- epoch drivers ----------------------------------------------------
    def run_one_epoch(
        self,
        loader: Iterable[Dict],
        is_train: bool = False,
        fetch: bool = True,
    ) -> Optional[Dict[str, float]]:
        """``fetch=False`` skips the device->host metric transfer and
        returns None (metrics_every support: between metric epochs no
        host transfer happens at all).

        cache=True loaders (single-process) take the scanned-epoch path:
        the whole epoch is ONE device dispatch."""
        acc = init_accumulators(self.metric_specs)
        if getattr(loader, 'cache', False) and not self.dp:
            stacked = self._stacked_for(loader)
            order = loader.epoch_order()
            chunk = self._scan_chunk()
            for lo in range(0, len(order), chunk):
                part = jnp.asarray(order[lo:lo + chunk], jnp.int32)
                if is_train:
                    self.params, self.opt_state, acc = self._train_epoch(
                        self.params, self.opt_state, acc, stacked, part
                    )
                else:
                    acc = self._eval_epoch(self.params, acc, stacked,
                                           part)
        else:
            for batch in self._epoch_batches(loader):
                if is_train:
                    self.params, self.opt_state, acc = self._train_step(
                        self.params, self.opt_state, batch, acc
                    )
                else:
                    acc, _ = self._eval_step(self.params, batch, acc)
        if not fetch:
            return None
        if self.dp:
            return finalize(self.metric_specs, jax.device_get(acc))
        return finalize(self.metric_specs, self._fetch_accs(acc)[0])

    @staticmethod
    def _fetch_accs(*accs):
        """Fetch accumulator dicts in ONE device->host transfer.

        On the tunneled runtime every array fetch is a full round trip
        (~35 ms); a metric dict holds 2*n_metrics scalars, so fetching
        them individually dominates the per-epoch overhead.  Stack all
        scalars into one device array, fetch once, unpack host-side."""
        names = [(i, k) for i, a in enumerate(accs) for k in sorted(a)]
        flat = np.asarray(jax.device_get(
            jnp.stack([accs[i][k] for i, k in names])))
        out = [{} for _ in accs]
        for (i, k), v in zip(names, flat):
            out[i][k] = v
        return out

    def run_one_epoch_rehearsal(
        self,
        loader: Iterable[Dict],
        memloader,
        is_train: bool = True,
        fetch: bool = True,
    ) -> Tuple[Optional[Dict[str, float]], Optional[Dict[str, float]]]:
        """Interleaved replay: after every train-batch step, take one
        optimizer step on the next memory batch (cycling iterator)
        (reference: sevenn/train/trainer.py:157-222)."""
        acc = init_accumulators(self.metric_specs)
        mem_acc = init_accumulators(self.metric_specs)
        if (
            is_train
            and getattr(loader, 'cache', False)
            and getattr(memloader, 'cache', False)
            and not self.dp
        ):
            stacked = self._stacked_for(loader)
            mem_stacked = self._stacked_for(memloader)
            order = loader.epoch_order()
            mem_order = jnp.asarray(memloader.epoch_order(), jnp.int32)
            chunk = self._scan_chunk()
            for lo in range(0, len(order), chunk):
                part = jnp.asarray(order[lo:lo + chunk], jnp.int32)
                (self.params, self.opt_state, acc, mem_acc) = \
                    self._rehearsal_epoch(
                        self.params, self.opt_state, acc, mem_acc,
                        stacked, part, mem_stacked, mem_order,
                        jnp.asarray(lo, jnp.int32),
                    )
            if not fetch:
                return None, None
            acc_h, mem_h = self._fetch_accs(acc, mem_acc)
            return (
                finalize(self.metric_specs, acc_h),
                finalize(self.metric_specs, mem_h),
            )
        mem_iter = iter(self._epoch_batches(memloader))
        for batch in self._epoch_batches(loader):
            if is_train:
                self.params, self.opt_state, acc = self._train_step(
                    self.params, self.opt_state, batch, acc
                )
            else:
                acc, _ = self._eval_step(self.params, batch, acc)

            try:
                mem_batch = next(mem_iter)
            except StopIteration:
                mem_iter = iter(self._epoch_batches(memloader))
                mem_batch = next(mem_iter)
            if is_train:
                self.params, self.opt_state, mem_acc = self._train_step(
                    self.params, self.opt_state, mem_batch, mem_acc
                )
            else:
                mem_acc, _ = self._eval_step(self.params, mem_batch, mem_acc)
        if not fetch:
            return None, None
        acc_h, mem_h = self._fetch_accs(acc, mem_acc)
        return (
            finalize(self.metric_specs, acc_h),
            finalize(self.metric_specs, mem_h),
        )

    def compute_fisher_matrix(self, loader: Iterable[Dict],
                              loss_thr: float = -1.0):
        """Empirical Fisher: mean over samples of squared loss gradients,
        skipping samples whose loss exceeds the threshold (reference:
        sevenn/train/trainer.py:126-152).  Use batch size 1."""
        fisher = jax.tree_util.tree_map(jnp.zeros_like, self.params)
        count = jnp.zeros(())
        thr = jnp.asarray(float(loss_thr))
        for batch in loader:
            fisher, count = self._fisher_step(
                self.params, _device_batch(batch), fisher, count, thr
            )
        count_f = float(count)
        if count_f > 0:
            fisher = jax.tree_util.tree_map(lambda f: f / count_f, fisher)
        opt_params = jax.tree_util.tree_map(lambda p: p.copy(), self.params)
        return jax.device_get(fisher), jax.device_get(opt_params), int(count_f)

    # -- scheduler / checkpoint ------------------------------------------
    def scheduler_step(self, metric: Optional[float] = None):
        self.lr_controller.step(metric)
        self.opt_state = set_lr(self.opt_state, self.lr_controller.lr)

    def get_lr(self) -> float:
        return self.lr_controller.lr

    def get_checkpoint_dict(self) -> Dict:
        return {
            'model_state_dict': jax.device_get(self.params),
            'optimizer_state_dict': jax.device_get(self.opt_state),
            'scheduler_state_dict': self.lr_controller.state_dict(),
        }

    def load_state_dicts(self, model_state, optimizer_state=None,
                         scheduler_state=None):
        self.params = jax.tree_util.tree_map(jnp.asarray, model_state)
        if optimizer_state is not None:
            self.opt_state = optimizer_state
        if scheduler_state is not None:
            self.lr_controller.load_state_dict(scheduler_state)
            self.opt_state = set_lr(self.opt_state, self.lr_controller.lr)
