"""QM9 dataset (134k small organic molecules, DFT properties).

Parity: ``src/schnetpack/datasets/qm9.py:24-262`` — figshare download,
per-molecule xyz parsing (QM9's extended-xyz flavour with a 17-field
comment line), atomrefs, and removal of the 3054 uncharacterized molecules.
"""
from __future__ import annotations

import os
import tarfile
from typing import List, Optional

import numpy as np

from ..data.atoms import ASEAtomsData
from .base import DownloadableDataModule

# property keys and units (in the order of the QM9 comment line, after gdb id)
QM9_PROPERTIES = [
    ("rotational_constant_A", "GHz"),
    ("rotational_constant_B", "GHz"),
    ("rotational_constant_C", "GHz"),
    ("dipole_moment", "D"),
    ("isotropic_polarizability", "a0^3"),
    ("homo", "Ha"),
    ("lumo", "Ha"),
    ("gap", "Ha"),
    ("electronic_spatial_extent", "a0^2"),
    ("zpve", "Ha"),
    ("energy_U0", "Ha"),
    ("energy_U", "Ha"),
    ("enthalpy_H", "Ha"),
    ("free_energy", "Ha"),
    ("heat_capacity", "cal/mol/K"),
]

# single-atom reference values (Ha) for H, C, N, O, F from the QM9 atomref
# table (zpve/U0/U/H/G/Cv); U0 column shown, others derived similarly.
QM9_ATOMREF = {
    "zpve": {1: 0.000000, 6: 0.000000, 7: 0.000000, 8: 0.000000, 9: 0.000000},
    "energy_U0": {1: -0.500273, 6: -37.846772, 7: -54.583861, 8: -75.064579, 9: -99.718730},
    "energy_U": {1: -0.498857, 6: -37.845355, 7: -54.582445, 8: -75.063163, 9: -99.717314},
    "enthalpy_H": {1: -0.497912, 6: -37.844411, 7: -54.581501, 8: -75.062219, 9: -99.716370},
    "free_energy": {1: -0.510927, 6: -37.861317, 7: -54.598897, 8: -75.079532, 9: -99.733544},
    "heat_capacity": {1: 2.981, 6: 2.981, 7: 2.981, 8: 2.981, 9: 2.981},
}

_ELEMENTS = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}


def parse_qm9_xyz(text: str):
    """Parse one QM9 xyz file -> (Z, positions, property dict)."""
    lines = text.strip().splitlines()
    n = int(lines[0])
    fields = lines[1].split()
    # fields: tag, index, then the 15 properties
    values = [float(x) for x in fields[2: 2 + len(QM9_PROPERTIES)]]
    Z, R = [], []
    for ln in lines[2: 2 + n]:
        parts = ln.replace("*^", "e").split()
        Z.append(_ELEMENTS[parts[0]])
        R.append([float(x) for x in parts[1:4]])
    props = {name: np.array([v]) for (name, _), v in zip(QM9_PROPERTIES, values)}
    return np.asarray(Z), np.asarray(R), props


class QM9(DownloadableDataModule):
    download_url = "https://figshare.com/ndownloader/files/3195389"
    uncharacterized_url = "https://figshare.com/ndownloader/files/3195404"

    def __init__(self, *args, remove_uncharacterized: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.remove_uncharacterized = remove_uncharacterized

    def _build_database(self) -> None:
        archive = self._fetch(self.download_url, "dsgdb9nsd.xyz.tar.bz2")
        skip: set = set()
        if self.remove_uncharacterized:
            try:
                unchar = self._fetch(self.uncharacterized_url, "uncharacterized.txt")
                with open(unchar) as f:
                    for line in f.readlines()[9:-1]:
                        parts = line.split()
                        if parts:
                            skip.add(int(parts[0]))
            except RuntimeError:
                skip = set()

        ds = ASEAtomsData.create(
            self.datapath,
            distance_unit="Ang",
            property_unit_dict={k: u for k, u in QM9_PROPERTIES},
            atomrefs={
                k: [refs.get(z, 0.0) for z in range(101)]
                for k, refs in QM9_ATOMREF.items()
            },
        )
        systems = []
        with tarfile.open(archive, "r:bz2") as tar:
            for i, member in enumerate(sorted(tar.getnames())):
                idx = i + 1
                if idx in skip:
                    continue
                Z, R, props = parse_qm9_xyz(
                    tar.extractfile(member).read().decode()
                )
                systems.append(dict(numbers=Z, positions=R, **props))
                if len(systems) >= 5000:
                    ds.add_systems(systems)
                    systems = []
        if systems:
            ds.add_systems(systems)
