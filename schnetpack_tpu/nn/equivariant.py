"""Gated equivariant block (parity: ``src/schnetpack/nn/equivariant.py:11-71``).

Mixes vector channels with two linear maps, gates them by an MLP acting on
the concatenation of scalar features and vector norms.  Used by PaiNN's
tensorial output heads (dipoles, polarizability).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import shifted_softplus
from ..ops.math import safe_norm
from .base import Dense


class GatedEquivariantBlock(nn.Module):
    n_sout: int  # scalar output features
    n_vout: int  # vector output features
    n_hidden: int
    activation: Callable = shifted_softplus
    sactivation: Optional[Callable] = None

    @nn.compact
    def __call__(
        self, s: jax.Array, v: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """s: [N, F]; v: [N, 3, F] -> ([N, n_sout], [N, 3, n_vout])."""
        # two independent channel mixes of the vector features
        vmix1 = Dense(self.n_vout, use_bias=False, name="vmix1")(v)
        vmix2 = Dense(self.n_vout, use_bias=False, name="vmix2")(v)
        v_norm = safe_norm(vmix2, axis=-2)  # [N, n_vout]
        ctx = jnp.concatenate([s, v_norm], axis=-1)
        h = Dense(self.n_hidden, activation=self.activation, name="scalar_0")(ctx)
        h = Dense(self.n_sout + self.n_vout, name="scalar_1")(h)
        s_out, gate = h[..., : self.n_sout], h[..., self.n_sout:]
        v_out = vmix1 * gate[..., None, :]
        if self.sactivation is not None:
            s_out = self.sactivation(s_out)
        return s_out, v_out


def build_gated_equivariant_mlp(
    n_in: int,
    n_out: int,
    n_layers: int = 2,
    activation: Callable = shifted_softplus,
    sactivation: Optional[Callable] = None,
):
    """Stack of GatedEquivariantBlocks with pyramidal widths
    (parity: ``nn/blocks.py:79-157``)."""

    class GatedEquivariantMLP(nn.Module):
        @nn.compact
        def __call__(self, s, v):
            widths = []
            w = n_in
            for _ in range(n_layers - 1):
                w = max(n_out, w // 2)
                widths.append(w)
            widths.append(n_out)
            for i, wd in enumerate(widths):
                is_last = i == len(widths) - 1
                s, v = GatedEquivariantBlock(
                    n_sout=wd,
                    n_vout=wd,
                    n_hidden=wd if is_last else max(wd, n_out),
                    activation=activation,
                    sactivation=None if is_last else (sactivation or activation),
                    name=f"gated_{i}",
                )(s, v)
            return s, v

    return GatedEquivariantMLP()
