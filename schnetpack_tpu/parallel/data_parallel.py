"""Data-parallel training over a device mesh (shard_map + psum).

Replaces the reference's Lightning-DDP gradient all-reduce (SURVEY §2.12)
with the idiomatic JAX pattern: parameters replicated, per-device batches
sharded along a leading ``data`` axis, gradients averaged with
``lax.pmean`` over the mesh axis inside one jitted step.

Batch convention: every array leaf gains a leading axis of size
``mesh.shape['data']`` (one fixed-shape padded batch per device) — see
``stack_device_batches``.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.6 moved shard_map to jax.shard_map; keep both paths
    from jax import shard_map as _shard_map_mod

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:
    from jax.experimental.shard_map import shard_map  # type: ignore


def stack_device_batches(batches: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack D same-shape padded batches into one global batch [D, ...]."""
    keys = batches[0].keys()
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def split_loader_for_mesh(loader, n_devices: int):
    """Group consecutive loader batches into per-device stacks."""
    group = []
    for b in loader:
        group.append(b)
        if len(group) == n_devices:
            yield stack_device_batches(group)
            group = []


def make_parallel_train_step(task, mesh: Mesh, axis: str = "data"):
    """Jitted data-parallel train step: (state, global_batch) -> (state, metrics).

    ``state`` is replicated; ``global_batch`` leaves carry a leading device
    axis sharded over ``axis``.  Gradients/metrics are reduced with psum /
    pmean on the mesh axis, so the returned state is identical on every
    device.
    """

    def device_step(state, local_batch):
        # local_batch leaves have leading axis 1 (this device's shard)
        local = jax.tree.map(lambda x: jnp.squeeze(x, axis=0), local_batch)
        (loss, out), grads = jax.value_and_grad(task.loss_and_outputs, has_aux=True)(
            state.params, local
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = task.optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        if task.ema_decay:
            d = task.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params)
        else:
            ema = None
        metrics = {"train_loss": (loss, jnp.asarray(1.0))}
        for o in task.outputs:
            sums = o.metric_sums(out, local, "train")
            # cross-device exact aggregation: sum both value and count
            sums = {k: (jax.lax.psum(v, axis), jax.lax.psum(c, axis)) for k, (v, c) in sums.items()}
            metrics.update(sums)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        return new_state, metrics

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_eval_step(task, mesh: Mesh, axis: str = "data", prefix: str = "val"):
    def device_eval(params, local_batch):
        local = jax.tree.map(lambda x: jnp.squeeze(x, axis=0), local_batch)
        loss, out = task.loss_and_outputs(params, local)
        metrics = {f"{prefix}_loss": (jax.lax.pmean(loss, axis), jnp.asarray(1.0))}
        for o in task.outputs:
            sums = o.metric_sums(out, local, prefix)
            sums = {k: (jax.lax.psum(v, axis), jax.lax.psum(c, axis)) for k, (v, c) in sums.items()}
            metrics.update(sums)
        return metrics

    sharded = shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_global_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"):
    """Device-put a stacked global batch with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


class GroupedLoader:
    """Re-iterable view grouping a loader's batches into per-device stacks."""

    def __init__(self, loader, n_devices: int):
        self.loader = loader
        self.n_devices = n_devices

    def __iter__(self):
        return split_loader_for_mesh(self.loader, self.n_devices)


class DataParallelTask:
    """Adapter making ``Trainer.fit`` run data-parallel over a mesh.

    Wraps an ``AtomisticTask``: ``train_step`` consumes grouped batches
    (one per device, see ``GroupedLoader``), shards them over the ``data``
    axis and runs the psum'd step; evaluation/checkpointing delegate to the
    wrapped task (parameters are replicated, so single-device eval is
    exact).  This is the CLI-facing analog of the reference's
    ``trainer: ddp_trainer`` config.
    """

    def __init__(self, task, mesh: Mesh):
        self.task = task
        self.mesh = mesh
        self._pstep = make_parallel_train_step(task, mesh)

    # delegated surface used by Trainer ---------------------------------
    @property
    def learning_rate(self):
        return self.task.learning_rate

    @property
    def outputs(self):
        return self.task.outputs

    def create_state(self, rng, example_batch):
        return self.task.create_state(rng, example_batch)

    def eval_params(self, state):
        return self.task.eval_params(state)

    def eval_step(self, params, batch, prefix: str = "val"):
        return self.task.eval_step(params, batch, prefix)

    def train_step(self, state, group_batch):
        with self.mesh:
            sharded = shard_global_batch(group_batch, self.mesh)
            return self._pstep(state, sharded)
