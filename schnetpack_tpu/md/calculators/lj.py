"""Lennard-Jones test calculator.

Parity: ``src/schnetpack/md/calculators/lj_calculator.py:19-230`` — an
analytic LJ potential with a smooth healing-length cutoff, used to validate
integrators/thermostats without a trained model.  Forces come from
``jax.grad`` of the pure energy function.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import properties as structure
from ..system import System
from .base import PairwiseMDCalculator


class LJCalculator(PairwiseMDCalculator):
    def __init__(
        self,
        r_equilibrium: float,   # position of the minimum [model units]
        well_depth: float,      # epsilon [model units]
        cutoff: float,
        healing_length: float = 0.5,
        calc_stress: bool = False,
        energy_unit: str = "eV",
        position_unit: str = "Ang",
        **kwargs,
    ):
        super().__init__(
            cutoff=cutoff,
            energy_unit=energy_unit,
            position_unit=position_unit,
            stress_key=structure.stress if calc_stress else None,
            **kwargs,
        )
        # sigma from r_min = 2^(1/6) sigma
        self.sigma = r_equilibrium / 2.0 ** (1.0 / 6.0)
        self.epsilon = well_depth
        self.cutoff = cutoff
        self.healing_length = healing_length
        self.calc_stress = calc_stress

    def _energy(self, positions, pair_inputs, idx_m, n_mol, atom_mask):
        idx_i = pair_inputs[structure.idx_i]
        idx_j = pair_inputs[structure.idx_j]
        offsets = pair_inputs[structure.offsets]
        mask = pair_inputs[structure.pair_mask]
        Rij = (
            jnp.take(positions, idx_j, axis=0)
            - jnp.take(positions, idx_i, axis=0)
            + offsets
        )
        d = jnp.sqrt(jnp.sum(Rij * Rij, axis=-1) + 1e-16)
        sr6 = (self.sigma / d) ** 6
        e_pair = 4.0 * self.epsilon * (sr6 * sr6 - sr6)
        # smooth healing to zero between rc - h and rc
        r_on = self.cutoff - self.healing_length
        x = jnp.clip((d - r_on) / self.healing_length, 0.0, 1.0)
        smooth = 1.0 - x * x * (3.0 - 2.0 * x)
        e_pair = 0.5 * e_pair * smooth * mask
        from ...ops.scatter import segment_sum

        e_atom = segment_sum(e_pair, idx_i, positions.shape[0])
        return segment_sum(e_atom * atom_mask, idx_m, n_mol)

    def calculate(self, system: System, calc_state=None) -> System:
        inputs = self._get_system_molecules(system)
        pair_inputs = self._pair_inputs(system)
        R_, A, M = system.n_replicas, system.total_atoms, system.n_molecules
        positions = inputs[structure.R]
        idx_m = inputs[structure.idx_m]
        atom_mask = inputs[structure.atom_mask]

        def total_e(pos):
            e_mol = self._energy(pos, pair_inputs, idx_m, R_ * M, atom_mask)
            return jnp.sum(e_mol), e_mol

        (etot, e_mol), grad = jax.value_and_grad(total_e, has_aux=True)(positions)
        outputs = {structure.energy: e_mol, structure.forces: -grad}
        if self.calc_stress:
            # stress via strain derivative of the pair energy
            def e_of_eps(eps):
                eps_m = jnp.take(eps, idx_m, axis=0)
                pos2 = positions + jnp.einsum("ai,aij->aj", positions, eps_m)
                pi = pair_inputs[structure.idx_i]
                eps_p = jnp.take(eps, jnp.take(idx_m, pi, axis=0), axis=0)
                off2 = pair_inputs[structure.offsets] + jnp.einsum(
                    "pi,pij->pj", pair_inputs[structure.offsets], eps_p
                )
                p2 = dict(pair_inputs)
                p2[structure.offsets] = off2
                return jnp.sum(self._energy(pos2, p2, idx_m, R_ * M, atom_mask))

            eps0 = jnp.zeros((R_ * M, 3, 3), positions.dtype)
            dEdeps = jax.grad(e_of_eps)(eps0)
            cells = inputs[structure.cell]
            vol = jnp.maximum(jnp.abs(jnp.linalg.det(cells)), 1e-9)
            sigma = dEdeps / vol[:, None, None]
            outputs[structure.stress] = 0.5 * (sigma + jnp.swapaxes(sigma, 1, 2))
        return self._update_system(system, outputs)
