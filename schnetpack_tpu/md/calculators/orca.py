"""ORCA ab-initio calculator for (QM/ML) MD.

Parity: ``src/schnetpack/md/calculators/orca_calculator.py:21-239`` and the
``QMCalculator`` base (``base_calculator.py:234+``): writes per-molecule
ORCA input files, runs the orca binary as a subprocess, parses energies and
gradients back into the System.  Host-side by construction (the QM code is
external); the MD loop falls back to chunked host stepping when this
calculator is used.
"""
from __future__ import annotations

import os
import subprocess
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ... import properties as structure
from ...datasets.xyz import _SYMBOLS
from ...units import _parse_unit, md_units
from ..parsers.orca_parser import OrcaParser
from ..system import System
from .base import MDCalculator


class OrcaCalculator(MDCalculator):
    is_host_calculator = True

    def __init__(
        self,
        orca_path: str = "orca",
        basis_set: str = "def2-SVP",
        functional: str = "PBE",
        additional_keywords: str = "ENGRAD",
        working_dir: str = "orca_scratch",
        n_procs: int = 1,
        **kwargs,
    ):
        kwargs.setdefault("energy_unit", "Ha")
        kwargs.setdefault("position_unit", "Ang")
        super().__init__(**kwargs)
        # ORCA gradients come back in Hartree/Bohr
        self.force_conversion = (
            _parse_unit("Ha") * md_units().energy
        ) / (_parse_unit("Bohr") * md_units().length)
        self.orca_path = orca_path
        self.basis_set = basis_set
        self.functional = functional
        self.additional_keywords = additional_keywords
        self.working_dir = working_dir
        self.n_procs = n_procs
        self.parser = OrcaParser()
        os.makedirs(working_dir, exist_ok=True)

    def _write_input(self, Z: np.ndarray, R: np.ndarray, tag: str) -> str:
        path = os.path.join(self.working_dir, f"{tag}.inp")
        with open(path, "w") as f:
            f.write(f"! {self.functional} {self.basis_set} {self.additional_keywords}\n")
            if self.n_procs > 1:
                f.write(f"%pal nprocs {self.n_procs} end\n")
            f.write("* xyz 0 1\n")
            for z, r in zip(Z, R):
                f.write(f"{_SYMBOLS[int(z)]} {r[0]:.10f} {r[1]:.10f} {r[2]:.10f}\n")
            f.write("*\n")
        return path

    def _run_orca(self, input_file: str) -> Dict[str, np.ndarray]:
        out_file = os.path.splitext(input_file)[0] + ".out"
        with open(out_file, "w") as f:
            subprocess.run(
                [self.orca_path, input_file], stdout=f,
                stderr=subprocess.STDOUT, check=True, timeout=86400,
            )
        return self.parser.parse(out_file)

    def calculate(self, system: System, calc_state=None) -> System:
        """Evaluate every molecule x replica with ORCA (host side)."""
        R_, A, M = system.n_replicas, system.total_atoms, system.n_molecules
        pos = np.asarray(system.positions) / self.position_conversion  # -> Ang
        Z = np.asarray(system.atomic_numbers)
        idx_m = np.asarray(system.idx_m)

        energies = np.zeros((R_, M))
        forces = np.zeros((R_, A, 3))
        for r in range(R_):
            for m in range(M):
                sel = idx_m == m
                results = self._run_orca(
                    self._write_input(Z[sel], pos[r, sel], f"mol_{r}_{m}")
                )
                energies[r, m] = float(results["energy"])
                forces[r, sel] = results["forces"]

        return system.replace(
            energy=jnp.asarray(energies * self.energy_conversion, system.energy.dtype),
            forces=jnp.asarray(forces * self.force_conversion, system.forces.dtype),
        )
