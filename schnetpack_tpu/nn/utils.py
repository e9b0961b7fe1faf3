"""Derivative helpers.

Parity: ``src/schnetpack/nn/utils.py`` — the reference loops
``torch.autograd.grad`` over flattened outputs (``derivative_from_molecular``,
:21-63) and per-molecule blocks (``derivative_from_atomic``, :65-126,
documented there as inefficient).  In JAX both collapse to ``jax.jacrev``
compositions; these wrappers keep the reference's call signatures for users
porting code.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def derivative_from_molecular(
    fn: Callable[[jax.Array], jax.Array], inputs: jax.Array
) -> jax.Array:
    """Jacobian d fn / d inputs, batched over the leading axis of outputs.

    fn: [.. in_shape] -> [out...]; returns [out..., in...].
    """
    return jax.jacrev(fn)(inputs)


def derivative_from_atomic(
    fn: Callable[[jax.Array], jax.Array],
    inputs: jax.Array,
    idx_m: jax.Array,
    n_molecules: int,
) -> jax.Array:
    """Per-molecule second-derivative blocks (e.g. Hessians).

    Computes the full Jacobian once (XLA batches the rows — unlike the
    reference's per-output grad loop) and masks cross-molecule blocks.
    fn: [A, 3] -> [A, 3]; returns [A, 3, A, 3] with zero blocks between
    different molecules.
    """
    full = jax.jacrev(fn)(inputs)  # [A, 3, A, 3]
    same = (idx_m[:, None] == idx_m[None, :]).astype(full.dtype)
    return full * same[:, None, :, None]


def replicate_module(module_factory: Callable, n: int, share_params: bool):
    """Parity helper: build n blocks, optionally sharing parameters.

    In flax, sharing means reusing ONE module instance (same name ->
    same parameters); see the ``shared_interactions`` flags on the
    representation modules which use exactly this pattern.
    """
    if share_params:
        block = module_factory()
        return [block] * n
    return [module_factory() for _ in range(n)]
