"""Training task: model outputs, losses, and the jitted train/eval steps.

Parity: ``src/schnetpack/task.py`` (ModelOutput / UnsupervisedModelOutput /
ConsiderOnlySelectedAtoms / AtomisticTask).  Lightning is replaced by a pure
optax/jax step pair owned by ``AtomisticTask``:

* ``train_step``: value_and_grad over the weighted multi-output loss,
  optimizer update with linear LR warmup (parity: task.py:280-293), optional
  EMA parameter tracking (parity: train/callbacks.py EMA), plateau scale;
* ``eval_step``: forward + metric sums.

Both are pure functions of (state, batch) and jit/pjit-compatible; the
data-parallel path shards them with ``shard_map`` (parallel/).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .. import properties
from .metrics import METRICS, finalize_metric


def _mask_for(pred: jax.Array, batch: Dict[str, jax.Array]) -> jax.Array:
    """Pick the validity mask matching the leading axis of ``pred``."""
    A = batch[properties.Z].shape[0]
    M = batch[properties.n_atoms].shape[0]
    if pred.ndim >= 1 and pred.shape[0] == A:
        return batch[properties.atom_mask]
    if pred.ndim >= 1 and pred.shape[0] == M:
        return batch[properties.mol_mask]
    return jnp.ones(pred.shape[:1], dtype=pred.dtype)


def _masked_mse(pred, target, mask):
    m = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim))
    n = jnp.maximum(jnp.sum(m) * float(jnp.size(pred) // max(pred.shape[0], 1)), 1.0)
    return jnp.sum(jnp.square(pred - target) * m) / n


def _masked_mae(pred, target, mask):
    m = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim))
    n = jnp.maximum(jnp.sum(m) * float(jnp.size(pred) // max(pred.shape[0], 1)), 1.0)
    return jnp.sum(jnp.abs(pred - target) * m) / n


def _masked_huber(pred, target, mask, delta: float = 1.0):
    m = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim))
    n = jnp.maximum(jnp.sum(m) * float(jnp.size(pred) // max(pred.shape[0], 1)), 1.0)
    err = optax.huber_loss(pred, target, delta)
    return jnp.sum(err * m) / n


LOSSES: Dict[str, Callable] = {
    "mse": _masked_mse,
    "mae": _masked_mae,
    "huber": _masked_huber,
}


class ConsiderOnlySelectedAtoms:
    """Constraint restricting loss/metrics to selected atoms
    (parity: task.py:304-339).  ``selection_name`` keys a [A]-shaped 0/1
    array in the batch."""

    def __init__(self, selection_name: str):
        self.selection_name = selection_name

    def __call__(self, pred, target, mask, batch):
        sel = batch[self.selection_name].astype(mask.dtype)
        return pred, target, mask * sel


@dataclasses.dataclass
class ModelOutput:
    """One supervised output head (parity: task.py:14-71)."""

    name: str
    target_property: Optional[str] = None
    loss_fn: str = "mse"
    loss_weight: float = 1.0
    metrics: Sequence[str] = ("mae",)
    constraints: Sequence = ()

    @property
    def target(self) -> str:
        return self.target_property or self.name

    def _target(self, pred, batch):
        target = batch[self.target].astype(pred.dtype)
        if target.shape != pred.shape:
            # NEVER let pred/target broadcast silently: an [M, 1] target
            # against an [M] prediction forms an [M, M] error matrix and
            # trains the head toward the label mean.
            raise ValueError(
                f"output '{self.name}': prediction shape {pred.shape} != "
                f"target '{self.target}' shape {target.shape}"
            )
        return target

    def loss(self, outputs, batch):
        pred = outputs[self.name]
        target = self._target(pred, batch)
        mask = _mask_for(pred, batch)
        for c in self.constraints:
            pred, target, mask = c(pred, target, mask, batch)
        return self.loss_weight * LOSSES[self.loss_fn](pred, target, mask)

    def metric_sums(self, outputs, batch, prefix: str):
        pred = outputs[self.name]
        target = self._target(pred, batch)
        mask = _mask_for(pred, batch)
        for c in self.constraints:
            pred, target, mask = c(pred, target, mask, batch)
        sums = {}
        for m in self.metrics:
            s, c_ = METRICS[m](pred, target, mask)
            sums[f"{prefix}_{self.name}_{m}"] = (s, c_)
        return sums


@dataclasses.dataclass
class UnsupervisedModelOutput(ModelOutput):
    """Label-free loss term, e.g. a regularizer (parity: task.py:73-88)."""

    def loss(self, outputs, batch):
        pred = outputs[self.name]
        mask = _mask_for(pred, batch)
        zeros = jnp.zeros_like(pred)
        return self.loss_weight * LOSSES[self.loss_fn](pred, zeros, mask)

    def metric_sums(self, outputs, batch, prefix: str):
        pred = outputs[self.name]
        mask = _mask_for(pred, batch)
        zeros = jnp.zeros_like(pred)
        sums = {}
        for m in self.metrics:
            s, c_ = METRICS[m](pred, zeros, mask)
            sums[f"{prefix}_{self.name}_{m}"] = (s, c_)
        return sums


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    lr_scale: jax.Array  # plateau-scheduler multiplier


class AtomisticTask:
    """Owns the model + outputs + optimizer; builds pure step functions.

    Parity with ``AtomisticTask`` (task.py:90-301): weighted-sum loss over
    outputs, per-split metrics, warmup, scheduler hook, EMA.
    """

    def __init__(
        self,
        model,
        outputs: Sequence[ModelOutput],
        learning_rate: float = 1e-4,
        optimizer: str = "adamw",
        optimizer_args: Optional[Dict] = None,
        warmup_steps: int = 0,
        ema_decay: Optional[float] = None,
        grad_clip: Optional[float] = None,
        weight_decay: float = 0.0,
    ):
        self.model = model
        self.outputs = list(outputs)
        self.learning_rate = learning_rate
        self.warmup_steps = warmup_steps
        self.ema_decay = ema_decay
        args = dict(optimizer_args or {})

        def lr_schedule(step):
            if warmup_steps > 0:
                warm = jnp.minimum(step.astype(jnp.float32) / warmup_steps, 1.0)
            else:
                warm = 1.0
            return learning_rate * warm

        chain = []
        if grad_clip:
            chain.append(optax.clip_by_global_norm(grad_clip))
        if optimizer == "adamw":
            chain.append(optax.adamw(lr_schedule, weight_decay=weight_decay, **args))
        elif optimizer == "adabelief":
            chain.append(optax.adabelief(lr_schedule, **args))
        elif optimizer == "adam":
            chain.append(optax.adam(lr_schedule, **args))
        elif optimizer == "sgd":
            chain.append(optax.sgd(lr_schedule, **args))
        else:
            raise ValueError(f"unknown optimizer {optimizer}")
        self.optimizer = optax.chain(*chain)

        # donate the state buffers: params/opt-state are updated in place on
        # device instead of being copied every step
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl, static_argnames=("prefix",))

    # ------------------------------------------------------------------
    def create_state(self, rng, example_batch) -> TrainState:
        batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
        params = self.model.init(rng, batch)
        # ema must be a distinct copy: the train step donates the whole
        # state, and aliased buffers cannot be donated twice
        ema = jax.tree.map(jnp.copy, params) if self.ema_decay else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=ema,
            lr_scale=jnp.ones((), jnp.float32),
        )

    # ------------------------------------------------------------------
    def loss_and_outputs(self, params, batch):
        out = self.model.apply(params, batch, do_postprocessing=False)
        loss = 0.0
        for o in self.outputs:
            loss = loss + o.loss(out, batch)
        return loss, out

    def _train_step_impl(self, state: TrainState, batch):
        (loss, out), grads = jax.value_and_grad(self.loss_and_outputs, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        if self.ema_decay:
            d = self.ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params
            )
        else:
            ema = None
        metrics = {"train_loss": (loss, jnp.asarray(1.0))}
        for o in self.outputs:
            metrics.update(o.metric_sums(out, batch, "train"))
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        return new_state, metrics

    def _eval_step_impl(self, params, batch, prefix: str = "val"):
        loss, out = self.loss_and_outputs(params, batch)
        metrics = {f"{prefix}_loss": (loss, jnp.asarray(1.0))}
        for o in self.outputs:
            metrics.update(o.metric_sums(out, batch, prefix))
        return metrics

    # public API --------------------------------------------------------
    def train_step(self, state, batch) -> Tuple[TrainState, Dict]:
        # training needs filter-weight cotangents from the column message
        # kernels even if an MD calculator disabled them earlier in this
        # process (the flag is read at trace time, see ops/cellblock.py)
        from ..ops import cellblock as _cb

        _cb.WGRAD = True
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._train_step(state, batch)

    def eval_step(self, params, batch, prefix: str = "val") -> Dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._eval_step(params, batch, prefix)

    def eval_params(self, state: TrainState):
        return state.ema_params if self.ema_decay else state.params


def aggregate_metrics(batched: List[Dict[str, Tuple]]) -> Dict[str, float]:
    """Sum (value, count) pairs over batches and finalize."""
    totals: Dict[str, Tuple[float, float]] = {}
    for m in batched:
        for k, (v, c) in m.items():
            v, c = float(v), float(c)
            if k in totals:
                totals[k] = (totals[k][0] + v, totals[k][1] + c)
            else:
                totals[k] = (v, c)
    out = {}
    for k, (v, c) in totals.items():
        metric_name = k.rsplit("_", 1)[-1]
        out[k] = finalize_metric(metric_name, v, c)
    return out
