"""SO3net: spherical-harmonic message-passing representation.

Parity: ``src/schnetpack/representation/so3net.py:103-155`` — embed ->
scalar2rsh -> per block: SO3Convolution, optional tensor-product residual,
parametric gated nonlinearity, feature mixings; outputs scalar features,
the full multipole field and (optionally) a Cartesian vector view of the
l=1 channels.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import properties
from ..nn.base import Dense
from ..nn.cutoff import CosineCutoff
from ..nn.radial import GaussianRBF
from ..nn.so3 import (
    SO3Convolution,
    SO3ParametricGatedNonlinearity,
    SO3TensorProduct,
)
from ..ops import so3 as so3_ops
from ..ops.math import safe_norm


class SO3net(nn.Module):
    n_atom_basis: int = 64
    n_interactions: int = 3
    lmax: int = 2
    n_rbf: int = 20
    cutoff: float = 5.0
    max_z: int = 100
    radial_basis: Optional[nn.Module] = None
    cutoff_fn: Optional[nn.Module] = None
    return_vector_representation: bool = False
    shared_interactions: bool = False

    @nn.compact
    def __call__(self, inputs):
        Z = inputs[properties.Z]
        F = self.n_atom_basis
        dense = properties.nbh_rij in inputs

        radial = self.radial_basis or GaussianRBF(n_rbf=self.n_rbf, cutoff=self.cutoff)
        cutoff_fn = self.cutoff_fn or CosineCutoff(cutoff=self.cutoff)

        col_refs = None
        if properties.cell_qcol in inputs:
            # column-bucketed layout (TPU fast path, VERDICT r4 #5): the
            # gather/fold of the SO(3) features run as the generic one-hot
            # MXU selection kernels over [nx, ny, Ktot] edge space; the
            # per-edge Ylm/CG algebra stays XLA elementwise.
            from ..ops.colblock import ColRefs

            qc = inputs[properties.cell_qcol]
            ksz = tuple(a.shape[0] for a in inputs[properties.cell_ksz])
            Pc = inputs[properties.R].shape[0] // (qc.shape[0] * qc.shape[1])
            col_refs = ColRefs(qc, inputs[properties.cell_dcol], Pc, ksz,
                               None, inputs.get(properties.cell_oh))
            Rij = inputs[properties.col_rij]        # [nx, ny, Ktot, 3]
            emask = inputs[properties.cell_emask]
            idx_i = idx_j = nbh_idx = nbh_rev = nbh_mask = None
            d_ij = safe_norm(Rij, axis=-1)
            dir_ij = Rij / d_ij[..., None]
            cutoff_ij = cutoff_fn(d_ij) * emask
        elif dense:
            Rij = inputs[properties.nbh_rij]
            nbh_idx = inputs[properties.nbh_idx]
            nbh_rev = inputs.get(properties.nbh_rev)
            nbh_mask = inputs[properties.nbh_mask]
            idx_i = idx_j = None
            d_ij = safe_norm(Rij, axis=-1)
            dir_ij = Rij / d_ij[..., None]
            cutoff_ij = cutoff_fn(d_ij) * nbh_mask
        else:
            Rij = inputs[properties.Rij]
            idx_i = inputs[properties.idx_i]
            idx_j = inputs[properties.idx_j]
            nbh_idx = nbh_rev = nbh_mask = None
            d_ij = safe_norm(Rij, axis=-1)
            dir_ij = Rij / d_ij[:, None]
            cutoff_ij = cutoff_fn(d_ij) * inputs[properties.pair_mask]
        radial_ij = radial(d_ij)

        x0 = nn.Embed(self.max_z + 1, F, name="embedding")(Z)  # [A, F]
        x = so3_ops.scalar2rsh(x0, self.lmax)  # [A, n_lm, F]

        if self.shared_interactions:
            conv = [SO3Convolution(self.lmax, F, self.n_rbf, name="so3conv_shared")] * self.n_interactions
            mix1 = [Dense(F, use_bias=False, name="mix1_shared")] * self.n_interactions
            mix2 = [Dense(F, use_bias=False, name="mix2_shared")] * self.n_interactions
            mix3 = [Dense(F, use_bias=False, name="mix3_shared")] * self.n_interactions
            gate = [SO3ParametricGatedNonlinearity(F, self.lmax, name="gate_shared")] * self.n_interactions
            tp = [SO3TensorProduct(self.lmax, name="tp_shared")] * self.n_interactions
        else:
            conv = [SO3Convolution(self.lmax, F, self.n_rbf, name=f"so3conv_{t}") for t in range(self.n_interactions)]
            mix1 = [Dense(F, use_bias=False, name=f"mix1_{t}") for t in range(self.n_interactions)]
            mix2 = [Dense(F, use_bias=False, name=f"mix2_{t}") for t in range(self.n_interactions)]
            mix3 = [Dense(F, use_bias=False, name=f"mix3_{t}") for t in range(self.n_interactions)]
            gate = [SO3ParametricGatedNonlinearity(F, self.lmax, name=f"gate_{t}") for t in range(self.n_interactions)]
            tp = [SO3TensorProduct(self.lmax, name=f"tp_{t}") for t in range(self.n_interactions)]

        # block composition exactly as the reference forward
        # (so3net.py:137-146): conv -> mix1 -> +tensor-product -> mix2 ->
        # gate -> mix3 -> residual
        for t in range(self.n_interactions):
            dx = conv[t](x, radial_ij, dir_ij, cutoff_ij, idx_i, idx_j,
                         nbh_idx, nbh_rev, nbh_mask, col_refs=col_refs)
            ddx = mix1[t](dx)
            dx = dx + tp[t](dx, ddx)
            dx = mix2[t](dx)
            dx = gate[t](dx)
            dx = mix3[t](dx)
            x = x + dx

        inputs[properties.scalar_representation] = x[:, 0, :]
        inputs[properties.multipole_representation] = x
        if self.return_vector_representation:
            # l=1 channels in Ylm order (m=-1,0,1) = (y, z, x) -> roll to (x,y,z)
            v = x[:, 1:4, :]
            inputs[properties.vector_representation] = jnp.roll(v, 1, axis=1)
        return inputs
