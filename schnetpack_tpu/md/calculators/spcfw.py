"""Flexible SPC/Fw water force field (analytic, jit-friendly).

Implements the SPC/Fw model of Wu, Tepper & Voth (JCP 124, 024503, 2006):
harmonic OH bonds and HOH angle, O-O Lennard-Jones, damped/force-shifted
point-charge Coulomb between different waters.  Exists to run the driver's
parity gate 5 — *NVT liquid water with a Nose-Hoover thermostat, then
16-bead ring-polymer PIMD* — end to end through ``spkmd`` without needing
a trained model (the reference exercises the same machinery through its
``md_configs``; its LJ test calculator plays the analogous role,
``src/schnetpack/md/calculators/lj_calculator.py:19-230``).

Convention: atoms are ordered in O,H,H triplets (each water may be its own
molecule or part of one periodic box structure).  Intramolecular pairs are
excluded from the nonbonded terms by triplet id.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ... import properties as structure
from ..system import System
from .base import PairwiseMDCalculator

# SPC/Fw parameters (kcal/mol, Angstrom, radians, elementary charges)
R_OH0 = 1.012
K_BOND = 1059.162          # kcal/mol/A^2 (0.5*k*(r-r0)^2 with k doubled in paper's form)
THETA0 = np.deg2rad(113.24)
K_ANGLE = 75.90            # kcal/mol/rad^2
Q_O = -0.82
Q_H = 0.41
EPS_OO = 0.1554253         # kcal/mol
SIG_OO = 3.165492          # A
COULOMB_KE = 332.0637128   # kcal/mol * A / e^2


class SPCFwCalculator(PairwiseMDCalculator):
    """SPC/Fw flexible water (O,H,H atom triplets)."""

    def __init__(
        self,
        cutoff: float = 6.0,
        healing_length: float = 0.8,
        calc_stress: bool = False,
        **kwargs,
    ):
        kwargs.setdefault("energy_unit", "kcal/mol")
        kwargs.setdefault("position_unit", "Ang")
        super().__init__(
            cutoff=cutoff,
            stress_key=structure.stress if calc_stress else None,
            **kwargs,
        )
        self.cutoff = cutoff
        self.healing_length = healing_length
        self.calc_stress = calc_stress

    # ---------------------------------------------------------------- intra
    def _bonded_energy(self, positions, cells, idx_m, n_mol, atom_mask):
        A = positions.shape[0]
        n_w = A // 3
        O = positions[0::3][:n_w]
        H1 = positions[1::3][:n_w]
        H2 = positions[2::3][:n_w]
        w_mask = atom_mask[0::3][:n_w]
        cell = cells[0]  # one shared box (or zero cell for clusters)

        def min_image(d):
            def apply(dv):
                inv = jnp.linalg.inv(cell + jnp.eye(3) * 1e-30)
                frac = dv @ inv
                return dv - jnp.round(frac) @ cell

            periodic = jnp.abs(cell).sum() > 1e-12
            return jax.lax.cond(periodic, apply, lambda dv: dv, d)

        d1 = min_image(H1 - O)
        d2 = min_image(H2 - O)
        r1 = jnp.sqrt(jnp.sum(d1 * d1, axis=-1) + 1e-16)
        r2 = jnp.sqrt(jnp.sum(d2 * d2, axis=-1) + 1e-16)
        cos_t = jnp.sum(d1 * d2, axis=-1) / (r1 * r2)
        theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
        e_w = (
            0.5 * K_BOND * ((r1 - R_OH0) ** 2 + (r2 - R_OH0) ** 2)
            + 0.5 * K_ANGLE * (theta - THETA0) ** 2
        ) * w_mask
        # per-molecule sum (waters may share one idx_m entry)
        mol_of_w = idx_m[0::3][:n_w]
        from ...ops.scatter import segment_sum

        return segment_sum(e_w, mol_of_w, n_mol)

    # ------------------------------------------------------------ nonbonded
    def _nonbonded_energy(self, positions, pair_inputs, idx_m, n_mol,
                          atom_mask):
        idx_i = pair_inputs[structure.idx_i]
        idx_j = pair_inputs[structure.idx_j]
        offsets = pair_inputs[structure.offsets]
        mask = pair_inputs[structure.pair_mask]
        # exclude intramolecular (same O,H,H triplet) pairs
        same_water = (idx_i // 3) == (idx_j // 3)
        mask = mask * (1.0 - same_water.astype(mask.dtype))
        Rij = (
            jnp.take(positions, idx_j, axis=0)
            - jnp.take(positions, idx_i, axis=0)
            + offsets
        )
        d = jnp.sqrt(jnp.sum(Rij * Rij, axis=-1) + 1e-16)

        A = positions.shape[0]
        is_O = (jnp.arange(A) % 3) == 0
        q = jnp.where(is_O, Q_O, Q_H)
        qq = jnp.take(q, idx_i) * jnp.take(q, idx_j)
        rc = self.cutoff
        # force-shifted Coulomb (continuous energy and force at rc)
        e_coul = COULOMB_KE * qq * (
            1.0 / d - 1.0 / rc + (d - rc) / (rc * rc)
        )

        oo = jnp.take(is_O, idx_i) & jnp.take(is_O, idx_j)
        sr6 = (SIG_OO / d) ** 6
        e_lj = 4.0 * EPS_OO * (sr6 * sr6 - sr6) * oo.astype(d.dtype)

        r_on = rc - self.healing_length
        x = jnp.clip((d - r_on) / self.healing_length, 0.0, 1.0)
        smooth = 1.0 - x * x * (3.0 - 2.0 * x)
        e_pair = 0.5 * (e_coul + e_lj) * smooth * mask * (d < rc)
        from ...ops.scatter import segment_sum

        e_atom = segment_sum(e_pair, idx_i, A)
        return segment_sum(e_atom * atom_mask, idx_m, n_mol)

    def _energy(self, positions, pair_inputs, idx_m, n_mol, atom_mask,
                cells):
        return (
            self._bonded_energy(positions, cells, idx_m, n_mol, atom_mask)
            + self._nonbonded_energy(positions, pair_inputs, idx_m, n_mol,
                                     atom_mask)
        )

    def calculate(self, system: System, calc_state=None) -> System:
        inputs = self._get_system_molecules(system)
        pair_inputs = self._pair_inputs(system)
        R_, M = system.n_replicas, system.n_molecules
        positions = inputs[structure.R]
        idx_m = inputs[structure.idx_m]
        atom_mask = inputs[structure.atom_mask]
        cells = inputs[structure.cell]

        def total_e(pos):
            e_mol = self._energy(pos, pair_inputs, idx_m, R_ * M, atom_mask,
                                 cells)
            return jnp.sum(e_mol), e_mol

        (_, e_mol), grad = jax.value_and_grad(total_e, has_aux=True)(positions)
        outputs = {structure.energy: e_mol,
                   structure.forces: -grad * atom_mask[:, None]}
        return self._update_system(system, outputs)
