"""Parsers for ORCA quantum-chemistry output files.

Parity: ``src/schnetpack/md/parsers/orca_parser.py:46-754`` —
``OrcaMainFileParser`` (energy, forces/gradient, dipole, charges from the
main output), ``OrcaHessianFileParser`` (.hess files: hessian, dipole
derivatives, polarizability, normal modes) and an ``OrcaParser``
front-end.  Only the numeric payloads needed by the MD/ML pipeline are
extracted.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np

_BOHR = 0.5291772105638411  # Angstrom


class OrcaMainFileParser:
    """Extract energy / gradient / dipole / Mulliken charges from the main
    ORCA output file."""

    properties = ["energy", "forces", "dipole_moment", "charges", "positions", "atomic_numbers"]

    def parse_file(self, path: str) -> Dict[str, np.ndarray]:
        with open(path) as f:
            text = f.read()
        out: Dict[str, np.ndarray] = {}

        m = list(re.finditer(r"FINAL SINGLE POINT ENERGY\s+(-?\d+\.\d+)", text))
        if m:
            out["energy"] = np.array(float(m[-1].group(1)))  # Hartree

        # cartesian coordinates block (Angstrom)
        coord = list(
            re.finditer(
                r"CARTESIAN COORDINATES \(ANGSTROEM\)\n-+\n((?:\s*\w+\s+-?\d+\.\d+\s+-?\d+\.\d+\s+-?\d+\.\d+\n)+)",
                text,
            )
        )
        if coord:
            rows = coord[-1].group(1).strip().splitlines()
            from ...datasets.xyz import symbol_to_z

            Z, R = [], []
            for r in rows:
                parts = r.split()
                Z.append(symbol_to_z(parts[0]))
                R.append([float(x) for x in parts[1:4]])
            out["atomic_numbers"] = np.asarray(Z, np.int64)
            out["positions"] = np.asarray(R)

        # cartesian gradient block (Hartree/Bohr)
        grad = list(
            re.finditer(
                r"CARTESIAN GRADIENT\n-+\n\n((?:\s*\d+\s+\w+\s+:\s+-?\d+\.\d+\s+-?\d+\.\d+\s+-?\d+\.\d+\n)+)",
                text,
            )
        )
        if grad:
            rows = grad[-1].group(1).strip().splitlines()
            g = np.array([[float(x) for x in r.split()[3:6]] for r in rows])
            out["forces"] = -g  # Hartree/Bohr

        dip = list(
            re.finditer(
                r"Total Dipole Moment\s+:\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)\s+(-?\d+\.\d+)",
                text,
            )
        )
        if dip:
            out["dipole_moment"] = np.array([float(x) for x in dip[-1].groups()])

        mull = list(
            re.finditer(
                r"MULLIKEN ATOMIC CHARGES\n-+\n((?:\s*\d+\s+\w+\s*:\s+-?\d+\.\d+\n)+)",
                text,
            )
        )
        if mull:
            rows = mull[-1].group(1).strip().splitlines()
            out["charges"] = np.array([float(r.split(":")[1]) for r in rows])
        return out


class OrcaHessianFileParser:
    """Parse ORCA ``.hess`` files: $hessian, $dipole_derivatives,
    $polarizability_derivatives, $ir_spectrum."""

    properties = ["hessian", "dipole_derivatives", "polarizability_derivatives"]

    def _parse_matrix(self, lines: List[str], start: int):
        dim = int(lines[start].split()[0])
        # matrices are printed in column blocks of <=5
        mat = np.zeros((dim, dim))
        i = start + 1
        col0 = 0
        while col0 < dim:
            cols = [int(c) for c in lines[i].split()]
            i += 1
            for r in range(dim):
                vals = lines[i].split()
                mat[r, cols[0]: cols[-1] + 1] = [float(v) for v in vals[1:]]
                i += 1
            col0 = cols[-1] + 1
        return mat, i

    def parse_file(self, path: str) -> Dict[str, np.ndarray]:
        with open(path) as f:
            lines = f.read().splitlines()
        out: Dict[str, np.ndarray] = {}
        for i, ln in enumerate(lines):
            tag = ln.strip()
            if tag == "$hessian":
                out["hessian"], _ = self._parse_matrix(lines, i + 1)
            elif tag == "$dipole_derivatives":
                n = int(lines[i + 1].split()[0])
                out["dipole_derivatives"] = np.array(
                    [[float(x) for x in lines[i + 2 + r].split()] for r in range(n)]
                )
            elif tag == "$polarizability_derivatives":
                n = int(lines[i + 1].split()[0])
                out["polarizability_derivatives"] = np.array(
                    [[float(x) for x in lines[i + 2 + r].split()] for r in range(n)]
                )
        return out


class OrcaParser:
    """Front-end combining main-file and hessian-file parsing
    (parity: OrcaParser / OrcaOutputParser)."""

    def __init__(self, properties: Optional[List[str]] = None):
        self.main = OrcaMainFileParser()
        self.hess = OrcaHessianFileParser()
        self.properties = properties

    def parse(self, output_file: str) -> Dict[str, np.ndarray]:
        out = self.main.parse_file(output_file)
        hess_file = os.path.splitext(output_file)[0] + ".hess"
        if os.path.exists(hess_file):
            out.update(self.hess.parse_file(hess_file))
        if self.properties:
            out = {k: v for k, v in out.items() if k in self.properties or k in
                   ("positions", "atomic_numbers")}
        return out
