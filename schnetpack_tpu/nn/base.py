"""Core NN building blocks (parity: ``src/schnetpack/nn/base.py``, ``blocks.py``)."""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import shifted_softplus

Activation = Optional[Callable[[jax.Array], jax.Array]]


class Dense(nn.Module):
    """Linear layer with optional fused activation and Xavier-uniform init.

    Parity: reference ``Dense`` (``nn/base.py:14-55``).
    """

    features: int
    use_bias: bool = True
    activation: Activation = None
    kernel_init: Callable = nn.initializers.xavier_uniform()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="linear",
        )(x)
        if self.activation is not None:
            y = self.activation(y)
        return y


class MLP(nn.Module):
    """Multi-layer perceptron.

    ``hidden``: explicit hidden widths; if None, a pyramidal schedule halving
    from the input width over ``n_layers`` is used (parity: ``build_mlp``,
    ``nn/blocks.py:12-77``).
    """

    n_out: int
    hidden: Optional[Sequence[int]] = None
    n_layers: int = 2
    activation: Activation = shifted_softplus
    last_bias: bool = True
    last_zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.hidden is not None:
            widths = list(self.hidden)
        else:
            # pyramidal: halve the width each layer down to n_out
            widths = []
            w = x.shape[-1]
            for _ in range(self.n_layers - 1):
                w = max(self.n_out, w // 2)
                widths.append(w)
        for i, w in enumerate(widths):
            x = Dense(w, activation=self.activation, name=f"dense_{i}")(x)
        out_init = (
            nn.initializers.zeros if self.last_zero_init else nn.initializers.xavier_uniform()
        )
        return Dense(
            self.n_out,
            use_bias=self.last_bias,
            activation=None,
            kernel_init=out_init,
            name=f"dense_{len(widths)}",
        )(x)


class Residual(nn.Module):
    """Pre-activation residual block (parity: ``nn/blocks.py:159-296``)."""

    features: int
    activation: Activation = shifted_softplus

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = self.activation(x)
        y = Dense(self.features, activation=self.activation, name="dense_0")(y)
        y = Dense(self.features, activation=None, kernel_init=nn.initializers.zeros, name="dense_1")(y)
        return x + y


class ResidualMLP(nn.Module):
    features: int
    n_out: int
    n_residual: int = 1
    activation: Activation = shifted_softplus
    last_zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.n_residual):
            x = Residual(self.features, activation=self.activation, name=f"residual_{i}")(x)
        x = self.activation(x)
        out_init = (
            nn.initializers.zeros if self.last_zero_init else nn.initializers.xavier_uniform()
        )
        return Dense(self.n_out, kernel_init=out_init, name="out")(x)
