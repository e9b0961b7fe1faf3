"""Trajectory loading from FileLogger HDF5 output.

Parity: ``src/schnetpack/md/data/hdf5_data.py:28-459`` — reads the
``molecules``/``properties`` groups, derives velocities and temperature,
and exports structure dicts per frame.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ... import properties as structure
from ...units import md_units


class HDF5Loader:
    def __init__(self, hdf5_file: str, skip_initial: int = 0, load_properties: bool = True):
        import h5py

        self.filename = hdf5_file
        self._f = h5py.File(hdf5_file, "r")
        mols = self._f["molecules"]
        self.time_step = float(mols.attrs["time_step"])  # MD internal units
        self.n_replicas = int(mols.attrs["n_replicas"])
        self.n_molecules = int(mols.attrs["n_molecules"])
        self.total_atoms = int(mols.attrs["total_atoms"])
        self.masses = np.asarray(mols.attrs["masses"])
        self.atomic_numbers = np.asarray(mols.attrs["atomic_numbers"])
        self.idx_m = np.asarray(mols.attrs["idx_m"])
        self.pbc = np.asarray(mols.attrs["pbc"])
        self.skip = skip_initial
        self.entries = mols["positions"].shape[0] - skip_initial

    def get(self, name: str, mol_idx: Optional[int] = None, replica_idx: Optional[int] = None,
            atomistic: Optional[bool] = None) -> np.ndarray:
        """Fetch a logged dataset [T, R, ...] (replica-averaged if
        ``replica_idx`` is None, like the reference's centroid default)."""
        grp = "molecules" if name in ("positions", "momenta", "forces", "cells") else "properties"
        if name == "velocities":
            data = self._f["molecules/momenta"][self.skip:] / self.masses[None, None, :, None]
        else:
            data = self._f[f"{grp}/{name}"][self.skip:]
        if replica_idx is None and data.ndim > 1 and data.shape[1] == self.n_replicas:
            data = data.mean(axis=1)
        elif replica_idx is not None:
            data = data[:, replica_idx]
        if mol_idx is not None and data.ndim > 1:
            if data.shape[1] == self.total_atoms:
                data = data[:, self.idx_m == mol_idx]
            elif data.shape[1] == self.n_molecules:
                data = data[:, mol_idx]
        return data

    @property
    def properties(self) -> List[str]:
        return list(self._f["properties"].keys()) + ["velocities"] + list(
            self._f["molecules"].keys()
        )

    def get_temperature(self) -> np.ndarray:
        return self.get("temperature")

    def convert_to_atoms(self, frame: int, replica_idx: Optional[int] = None) -> Dict:
        """Export one frame as a structure dict in ASE units."""
        pos = self.get("positions", replica_idx=replica_idx)[frame]
        conv = 1.0 / md_units().length
        out = {
            structure.Z: self.atomic_numbers,
            structure.R: pos * conv,
            structure.pbc: self.pbc[0] if self.pbc.ndim > 1 else self.pbc,
        }
        try:
            cells = self.get("cells", replica_idx=replica_idx)[frame]
            out[structure.cell] = cells[0] * conv
        except KeyError:
            out[structure.cell] = np.zeros((3, 3))
        return out

    def close(self):
        self._f.close()
