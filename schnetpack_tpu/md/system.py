"""MD system state.

Parity: ``src/schnetpack/md/system.py`` — state tensors shaped
``[n_replicas, total_atoms, 3]`` (replicas = RPMD beads or independent
trajectories, vectorized not distributed), molecule bookkeeping via
``idx_m``, and derived properties (kinetic energy, temperature, centroids,
volume, pressure).

TPU design: ``System`` is an immutable ``flax.struct`` pytree — every MD
step is a pure ``System -> System`` function, so the whole simulation loop
jits into one XLA program (``lax.scan`` in simulator.py).  Atom counts are
padded to a static size with ``atom_mask``.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .. import properties as structure
from ..ops.scatter import segment_sum
from ..transform.atomistic import ATOMIC_MASSES
from ..units import md_units


class System(flax.struct.PyTreeNode):
    """All dynamic + static state of an MD simulation (one pytree)."""

    # dynamic state [R, A, 3]
    positions: jax.Array
    momenta: jax.Array
    forces: jax.Array
    # per-molecule results [R, M] / [R, M, 3, 3]
    energy: jax.Array
    stress: jax.Array
    # cells [R, M, 3, 3]; zero when non-periodic
    cells: jax.Array

    # static structure (no gradients, replicated across beads)
    masses: jax.Array        # [A]
    atomic_numbers: jax.Array  # [A] int
    idx_m: jax.Array         # [A] int molecule ids; padding -> M-1... see mask
    atom_mask: jax.Array     # [A] 1/0
    pbc: jax.Array           # [M, 3] bool
    n_atoms_per_mol: jax.Array  # [M]
    # extra calculator outputs carried through the scan (shape-stable),
    # e.g. ensemble ``*_uncertainty`` streams — loggable via log_keys
    # (parity: the reference's property streams, ensemble_calculator.py)
    properties: dict = flax.struct.field(default_factory=dict)

    @property
    def n_replicas(self) -> int:
        return self.positions.shape[0]

    @property
    def total_atoms(self) -> int:
        return self.positions.shape[1]

    @property
    def n_molecules(self) -> int:
        return self.energy.shape[1]

    # ------------------------------------------------------------------
    def sum_atoms(self, x: jax.Array) -> jax.Array:
        """Aggregate per-atom [R, A, ...] -> per-molecule [R, M, ...]."""
        def per_replica(xr):
            mask = self.atom_mask.reshape((self.total_atoms,) + (1,) * (xr.ndim - 1))
            return segment_sum(xr * mask, self.idx_m, self.n_molecules)
        return jax.vmap(per_replica)(x)

    def expand_atoms(self, x: jax.Array) -> jax.Array:
        """Broadcast per-molecule [R, M, ...] -> per-atom [R, A, ...]."""
        return jax.vmap(lambda xr: jnp.take(xr, self.idx_m, axis=0))(x)

    # --- physical properties (parity: system.py:388-651) ---------------
    @property
    def velocities(self) -> jax.Array:
        return self.momenta / self.masses[None, :, None]

    @property
    def kinetic_energy_tensor(self) -> jax.Array:
        """[R, M, 3, 3] kinetic energy tensor 0.5 * sum p p^T / m."""
        ppt = (
            self.momenta[:, :, :, None]
            * self.momenta[:, :, None, :]
            / self.masses[None, :, None, None]
        )
        return 0.5 * self.sum_atoms(ppt)

    @property
    def kinetic_energy(self) -> jax.Array:
        """[R, M]"""
        ke = 0.5 * jnp.sum(self.momenta**2, axis=-1) / self.masses[None, :]
        return self.sum_atoms(ke[..., None])[..., 0]

    @property
    def degrees_of_freedom(self) -> jax.Array:
        return 3.0 * self.n_atoms_per_mol.astype(self.positions.dtype)

    @property
    def temperature(self) -> jax.Array:
        """[R, M] instantaneous temperature."""
        kB = md_units().kB
        dof = jnp.maximum(self.degrees_of_freedom, 1.0)
        return 2.0 * self.kinetic_energy / (dof[None, :] * kB)

    @property
    def centroid_positions(self) -> jax.Array:
        return jnp.mean(self.positions, axis=0, keepdims=True)

    @property
    def centroid_momenta(self) -> jax.Array:
        return jnp.mean(self.momenta, axis=0, keepdims=True)

    @property
    def centroid_kinetic_energy(self) -> jax.Array:
        p = jnp.mean(self.momenta, axis=0, keepdims=True)
        ke = 0.5 * jnp.sum(p**2, axis=-1) / self.masses[None, :]
        return self.sum_atoms(ke[..., None])[..., 0]

    @property
    def centroid_temperature(self) -> jax.Array:
        kB = md_units().kB
        dof = jnp.maximum(self.degrees_of_freedom, 1.0)
        return 2.0 * self.centroid_kinetic_energy / (dof[None, :] * kB)

    @property
    def volume(self) -> jax.Array:
        """[R, M]"""
        return jnp.abs(jnp.linalg.det(self.cells))

    @property
    def pressure(self) -> jax.Array:
        """[R, M] isotropic pressure from stress + kinetic contribution."""
        vol = jnp.maximum(self.volume, 1e-12)
        p_pot = -jnp.trace(self.stress, axis1=-2, axis2=-1) / 3.0
        p_kin = (
            2.0 / 3.0 * self.kinetic_energy / vol
        )
        return p_pot + p_kin

    def center_of_mass(self) -> jax.Array:
        """[R, M, 3]"""
        mr = self.positions * self.masses[None, :, None]
        total = self.sum_atoms(mr)
        mass = self.sum_atoms(
            jnp.broadcast_to(self.masses[None, :, None], self.positions.shape[:2] + (1,))
        )
        return total / jnp.maximum(mass, 1e-12)

    def remove_com_motion(self) -> "System":
        """Zero total momentum per molecule."""
        p_tot = self.sum_atoms(self.momenta)  # [R, M, 3]
        m_tot = self.sum_atoms(
            jnp.broadcast_to(self.masses[None, :, None], self.positions.shape[:2] + (1,))
        )
        v_com = p_tot / jnp.maximum(m_tot, 1e-12)
        p_new = self.momenta - self.expand_atoms(v_com) * self.masses[None, :, None]
        p_new = p_new * self.atom_mask[None, :, None]
        return self.replace(momenta=p_new)

    def wrap_positions(self) -> "System":
        """Wrap positions into their cells (periodic molecules only)."""
        def per_rep(pos, cells):
            cell_atom = jnp.take(cells, self.idx_m, axis=0)  # [A, 3, 3]
            has_cell = jnp.abs(jnp.linalg.det(cell_atom)) > 1e-12
            safe = cell_atom + jnp.eye(3, dtype=pos.dtype)[None] * (~has_cell[:, None, None])
            frac = jnp.einsum("aj,ajk->ak", pos, jnp.linalg.inv(safe))
            pbc_atom = jnp.take(self.pbc, self.idx_m, axis=0)
            frac = jnp.where(pbc_atom, frac % 1.0, frac)
            wrapped = jnp.einsum("ak,akj->aj", frac, safe)
            return jnp.where(has_cell[:, None], wrapped, pos)
        return self.replace(positions=jax.vmap(per_rep)(self.positions, self.cells))


def load_molecules(
    molecules: Sequence[Dict[str, np.ndarray]],
    n_replicas: int = 1,
    position_unit_input: str = "Ang",
    mass_unit_input: str = "Dalton",
    dtype=jnp.float32,
) -> System:
    """Build a System from sample dicts (parity: system.py:116-215).

    Inputs are in the given units (default: ASE frame) and converted into
    the global MD unit frame.
    """
    from ..units import _parse_unit

    md = md_units()
    pos_conv = _parse_unit(position_unit_input) * md.length
    mass_conv = _parse_unit(mass_unit_input) * md.mass

    n_mol = len(molecules)
    n_atoms = [len(m[structure.Z]) for m in molecules]
    A = sum(n_atoms)
    M = n_mol

    Z = np.concatenate([np.asarray(m[structure.Z]) for m in molecules])
    R = np.concatenate([np.asarray(m[structure.R], np.float64) for m in molecules])
    idx_m = np.concatenate([np.full(n, i) for i, n in enumerate(n_atoms)])
    masses = ATOMIC_MASSES[Z] * mass_conv
    cells = np.stack(
        [
            np.asarray(m.get(structure.cell, np.zeros((3, 3))), np.float64)
            for m in molecules
        ]
    )
    pbc = np.stack(
        [np.asarray(m.get(structure.pbc, np.zeros(3, bool)), bool) for m in molecules]
    )

    return System(
        positions=jnp.broadcast_to(
            jnp.asarray(R * pos_conv, dtype), (n_replicas, A, 3)
        ).copy(),
        momenta=jnp.zeros((n_replicas, A, 3), dtype),
        forces=jnp.zeros((n_replicas, A, 3), dtype),
        energy=jnp.zeros((n_replicas, M), dtype),
        stress=jnp.zeros((n_replicas, M, 3, 3), dtype),
        cells=jnp.broadcast_to(
            jnp.asarray(cells * pos_conv, dtype), (n_replicas, M, 3, 3)
        ).copy(),
        masses=jnp.asarray(masses, dtype),
        atomic_numbers=jnp.asarray(Z, jnp.int32),
        idx_m=jnp.asarray(idx_m, jnp.int32),
        atom_mask=jnp.ones(A, dtype),
        pbc=jnp.asarray(pbc),
        n_atoms_per_mol=jnp.asarray(n_atoms, jnp.int32),
    )
