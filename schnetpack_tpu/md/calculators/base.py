"""MD calculator base: unit conversion and System <-> batch plumbing.

Parity: ``src/schnetpack/md/calculators/base_calculator.py`` — the
calculator converts positions from MD internal units into the model's
units, flattens replicas into one padded batch (replica-shifted ``idx_m``,
``base_calculator.py:154-194``), runs the model, and writes
forces/energy/stress back into the System in MD units
(``base_calculator.py:120-152``).

Everything here is pure and traced into the simulator's scan body.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import properties as structure
from ...units import _parse_unit, md_units
from ..neighborlist_md import AllPairsNeighborListMD
from ..system import System


class MDCalculator:
    def __init__(
        self,
        required_properties: List[str] = (),
        force_key: str = structure.forces,
        energy_unit: str = "eV",
        position_unit: str = "Ang",
        energy_key: Optional[str] = structure.energy,
        stress_key: Optional[str] = None,
    ):
        md = md_units()
        self.force_key = force_key
        self.energy_key = energy_key
        self.stress_key = stress_key
        self.required_properties = list(required_properties)

        # model unit -> MD internal unit conversions
        self.energy_conversion = _parse_unit(energy_unit) * md.energy
        self.position_conversion = _parse_unit(position_unit) * md.length
        self.force_conversion = self.energy_conversion / self.position_conversion
        self.stress_conversion = self.energy_conversion / self.position_conversion**3

    # ------------------------------------------------------------------
    def _get_system_molecules(self, system: System) -> Dict[str, jax.Array]:
        """Flatten [R, A, ...] replicas into one batch of R*M molecules.

        Positions/cells are converted MD -> model units.
        """
        R_, A = system.n_replicas, system.total_atoms
        M = system.n_molecules
        dtype = system.positions.dtype
        inv_pos = 1.0 / self.position_conversion

        positions = (system.positions * inv_pos).reshape(R_ * A, 3)
        Z = jnp.tile(system.atomic_numbers, R_)
        idx_m = (
            jnp.tile(system.idx_m, R_)
            + jnp.repeat(jnp.arange(R_, dtype=system.idx_m.dtype) * M, A)
        )
        atom_mask = jnp.tile(system.atom_mask, R_)
        cells = (system.cells * inv_pos).reshape(R_ * M, 3, 3)
        pbc = jnp.tile(system.pbc, (R_, 1))
        n_atoms = jnp.tile(system.n_atoms_per_mol, R_)
        mol_mask = jnp.ones(R_ * M, dtype)

        return {
            structure.R: positions,
            structure.Z: Z,
            structure.idx_m: idx_m,
            structure.atom_mask: atom_mask,
            structure.cell: cells,
            structure.pbc: pbc,
            structure.n_atoms: n_atoms,
            structure.mol_mask: mol_mask,
        }

    def _update_system(self, system: System, outputs: Dict[str, jax.Array]) -> System:
        R_, A, M = system.n_replicas, system.total_atoms, system.n_molecules
        updates = {}
        if self.force_key is not None and self.force_key in outputs:
            f = outputs[self.force_key].reshape(R_, A, 3) * self.force_conversion
            updates["forces"] = f * system.atom_mask[None, :, None]
        if self.energy_key is not None and self.energy_key in outputs:
            updates["energy"] = (
                outputs[self.energy_key].reshape(R_, M) * self.energy_conversion
            )
        if self.stress_key is not None and self.stress_key in outputs:
            updates["stress"] = (
                outputs[self.stress_key].reshape(R_, M, 3, 3) * self.stress_conversion
            )
        return system.replace(**updates)

    def calculate(self, system: System, calc_state=None) -> System:
        raise NotImplementedError

    def init_state(self, system: System):
        """Optional device-side calculator state carried through the scan
        (e.g. a dense neighbor matrix); None by default."""
        return None

    def update_state(self, system: System, calc_state, probe=None):
        """Host-side between-chunk refresh (e.g. skin-based NBL rebuild).
        Returns the (possibly new) state; shapes must stay fixed."""
        return calc_state


class PairwiseMDCalculator(MDCalculator):
    """Base for calculators evaluating a model over on-device pair lists."""

    def __init__(self, cutoff: float, cutoff_shell: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        # cutoff given in the model's position unit; store in MD units
        self.cutoff_model_units = cutoff
        self.neighbor_list = AllPairsNeighborListMD(
            cutoff * self.position_conversion,
            cutoff_shell * self.position_conversion,
        )

    def _pair_inputs(self, system: System) -> Dict[str, jax.Array]:
        """Per-replica pair lists, flattened with replica-shifted indices.

        Offsets are converted MD -> model units to match positions.
        """
        R_, A = system.n_replicas, system.total_atoms
        # the molecule assignment is static: grab a host copy on the first
        # (eager) call and reuse it when tracing (scan body)
        if isinstance(system.idx_m, jax.core.Tracer):
            idx_m_np = self._idx_m_np
        else:
            idx_m_np = np.asarray(jax.device_get(system.idx_m))
            self._idx_m_np = idx_m_np

        def one(pos_r, cells_r):
            return self.neighbor_list.get_neighbors_single(
                pos_r, cells_r, idx_m_np, system.idx_m, system.pbc
            )

        per = jax.vmap(one)(system.positions, system.cells)
        P = per[structure.idx_i].shape[1]
        shift = (jnp.arange(R_, dtype=jnp.int32) * A)[:, None]
        return {
            structure.idx_i: (per[structure.idx_i] + shift).reshape(R_ * P),
            structure.idx_j: (per[structure.idx_j] + shift).reshape(R_ * P),
            structure.offsets: per[structure.offsets].reshape(R_ * P, 3)
            / self.position_conversion,
            structure.pair_mask: per[structure.pair_mask].reshape(R_ * P),
        }
