"""Fixture-based converter tests for the misc benchmark datasets
(VERDICT r3 #6): each test synthesizes a tiny raw archive in the exact
on-disk format the real distribution uses, runs the converter offline,
and asserts the resulting ASE-DB contents.
"""
import gzip
import os
import sys
import tarfile
import types

import numpy as np
import pytest

from schnetpack_tpu.data.atoms import ASEAtomsData
from schnetpack_tpu.datasets.misc import (
    ANI1,
    ISO17,
    QM7X,
    TMQM,
    MaterialsProject,
    OrganicMaterialsDatabase,
)

h5py = pytest.importorskip("h5py")


def _mk(tmp_path, name):
    raw = tmp_path / "raw"
    raw.mkdir(exist_ok=True)
    return str(tmp_path / name), str(raw)


# ------------------------------------------------------------------ ISO17
def test_iso17_converter(tmp_path):
    dbpath, raw = _mk(tmp_path, "iso17.db")
    # raw distribution: tar.gz of ASE DBs iso17/<fold>.db
    src_dir = tmp_path / "build" / "iso17"
    src_dir.mkdir(parents=True)
    src = ASEAtomsData.create(
        str(src_dir / "reference.db"), distance_unit="Ang",
        property_unit_dict={"total_energy": "eV", "atomic_forces": "eV/Ang"},
    )
    rng = np.random.RandomState(0)
    wanted = []
    for i in range(3):
        R = rng.rand(5, 3) * 3
        E, F = rng.randn(1), rng.randn(5, 3)
        wanted.append((E.copy(), F.copy()))
        src.add_system(numbers=np.array([6, 6, 8, 1, 1]), positions=R,
                       total_energy=E, atomic_forces=F)
    with tarfile.open(os.path.join(raw, "iso17.tar.gz"), "w:gz") as tar:
        tar.add(str(src_dir / "reference.db"), arcname="iso17/reference.db")

    dm = ISO17(dbpath, batch_size=2, raw_dir=raw, fold="reference")
    dm.prepare_data()
    ds = ASEAtomsData(dbpath)
    assert len(ds) == 3
    row = ds[1]
    np.testing.assert_allclose(np.ravel(row["total_energy"]), wanted[1][0])
    np.testing.assert_allclose(row["atomic_forces"], wanted[1][1])


# ------------------------------------------------------------------- ANI1
def test_ani1_converter(tmp_path):
    dbpath, raw = _mk(tmp_path, "ani1.db")
    # raw distribution: ANI-1_release/ani_gdb_s01.h5 with species strings
    # and [n_conf, n_atoms, 3] coordinate stacks
    h5dir = tmp_path / "build" / "ANI-1_release"
    h5dir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    with h5py.File(str(h5dir / "ani_gdb_s01.h5"), "w") as f:
        g = f.create_group("gdb11_s01")
        mol = g.create_group("gdb11_s01-0")
        mol["species"] = np.array([b"C", b"H", b"H", b"H", b"H"])
        mol["coordinates"] = rng.rand(4, 5, 3).astype(np.float32)
        mol["energies"] = np.array([-40.1, -40.2, -40.3, -40.4])
    with tarfile.open(os.path.join(raw, "ANI1_release.tar.gz"), "w:gz") as tar:
        tar.add(str(h5dir), arcname="ANI-1_release")

    dm = ANI1(dbpath, batch_size=2, raw_dir=raw, num_heavy_atoms=1)
    dm.prepare_data()
    ds = ASEAtomsData(dbpath)
    assert len(ds) == 4
    row = ds[2]
    np.testing.assert_array_equal(row["_atomic_numbers"], [6, 1, 1, 1, 1])
    np.testing.assert_allclose(np.ravel(row["energy"]), [-40.3])
    # atomrefs (self energies) recorded in the DB metadata
    aref = ds.metadata["atomrefs"]["energy"]
    assert abs(aref[6] - (-37.8302333826)) < 1e-9


# ------------------------------------------------------------------- QM7X
def test_qm7x_converter_full_property_map_and_duplicates(tmp_path):
    dbpath, raw = _mk(tmp_path, "qm7x.db")
    rng = np.random.RandomState(2)

    def conf(grp, name, n=4):
        c = grp.create_group(name)
        c["atNUM"] = np.array([6, 1, 1, 8][:n])
        c["atXYZ"] = rng.rand(n, 3)
        c["ePBE0+MBD"] = np.array(-1000.0 + rng.randn())
        c["totFOR"] = rng.randn(n, 3)
        c["eAT"] = np.array(-50.0)
        c["ePBE0"] = np.array(-999.0)
        c["eMBD"] = np.array(-1.0)
        c["pbe0FOR"] = rng.randn(n, 3)
        c["vdwFOR"] = rng.randn(n, 3)
        c["sRMSD"] = np.array(0.1)
        c["vDIP"] = rng.randn(3)
        c["mPOL"] = np.array(9.9)

    with h5py.File(os.path.join(raw, "1000.hdf5"), "w") as f:
        m1 = f.create_group("Geom-m1")
        conf(m1, "Geom-m1-i1-c1-opt")     # equilibrium
        conf(m1, "Geom-m1-i1-c1-d1")      # its perturbed child
        m2 = f.create_group("Geom-m2")
        conf(m2, "Geom-m2-i1-c1-opt")     # duplicate equilibrium family
        conf(m2, "Geom-m2-i1-c1-d1")
    # DupMols.dat marks the m2 family (reference strips a 4-char ".xyz")
    with open(os.path.join(raw, "DupMols.dat"), "w") as f:
        f.write("Geom-m2-i1-c1.xyz\n")

    dm = QM7X(dbpath, batch_size=2, raw_dir=raw)
    dm.sets = ["1000"]
    dm.prepare_data()
    ds = ASEAtomsData(dbpath)
    # m2's two conformations are filtered out
    assert len(ds) == 2
    row = ds[0]
    # full reference property map present (8 + dipole/polarizability)
    for key in ("energy", "forces", "Eat", "EPBE0", "EMBD", "FPBE0",
                "FMBD", "rmsd", "dipole_moment", "polarizability"):
        assert key in row, key
    # FPBE0 really carries the pbe0FOR payload (reference qm7x.py key
    # collision fixed), distinct from FMBD
    assert not np.allclose(row["FPBE0"], row["FMBD"])
    # group-id metadata for GroupSplit
    gids = ds.metadata["groups_ids"]
    assert gids["smiles_id"] == [1, 1]
    # h5py iterates alphabetically: d1 before opt (which maps to d0)
    assert sorted(gids["step_id"]) == [0, 1]
    # PBE0 atomrefs recorded
    assert abs(ds.metadata["atomrefs"]["EPBE0"][1] - (-13.641404161)) < 1e-9

    # only_equilibrium keeps just the opt conformation
    db2 = str(tmp_path / "qm7x_eq.db")
    dm2 = QM7X(db2, batch_size=2, raw_dir=raw, only_equilibrium=True)
    dm2.sets = ["1000"]
    dm2.prepare_data()
    assert len(ASEAtomsData(db2)) == 1
    db3 = str(tmp_path / "qm7x_neq.db")
    dm3 = QM7X(db3, batch_size=2, raw_dir=raw, only_non_equilibrium=True)
    dm3.sets = ["1000"]
    dm3.prepare_data()
    assert len(ASEAtomsData(db3)) == 1


# ------------------------------------------------------------------- OMDB
def test_omdb_converter(tmp_path):
    from schnetpack_tpu.datasets.xyz import format_extxyz_frame

    dbpath, raw = _mk(tmp_path, "omdb.db")
    build = tmp_path / "build"
    build.mkdir()
    rng = np.random.RandomState(3)
    frames = []
    gaps = []
    for i in range(3):
        frames.append(format_extxyz_frame(
            numbers=np.array([6, 8, 1]), positions=rng.rand(3, 3) * 4,
            cell=np.eye(3) * (5.0 + i),
        ))
        gaps.append(0.5 + i)
    (build / "structures.xyz").write_text("".join(frames))
    (build / "bandgaps.csv").write_text("\n".join(str(g) for g in gaps))
    with tarfile.open(os.path.join(raw, "OMDB-GAP1_v1.1.tar.gz"), "w:gz") as tar:
        tar.add(str(build / "structures.xyz"), arcname="structures.xyz")
        tar.add(str(build / "bandgaps.csv"), arcname="bandgaps.csv")

    dm = OrganicMaterialsDatabase(dbpath, batch_size=2, raw_dir=raw)
    dm.prepare_data()
    ds = ASEAtomsData(dbpath)
    assert len(ds) == 3
    row = ds[1]
    np.testing.assert_allclose(np.ravel(row["band_gap"]), [1.5])
    np.testing.assert_allclose(row["_cell"], np.eye(3) * 6.0)


# ------------------------------------------------------------------- TMQM
def test_tmqm_converter(tmp_path):
    dbpath, raw = _mk(tmp_path, "tmqm.db")
    xyz = (
        "3\n"
        "CSD_code = ABC123 | q = 0 | S = 0\n"
        "Fe 0.0 0.0 0.0\nO 1.8 0.0 0.0\nO -1.8 0.0 0.0\n"
    )
    with gzip.open(os.path.join(raw, "tmQM_X1.xyz.gz"), "wt") as f:
        f.write(xyz)
    with gzip.open(os.path.join(raw, "tmQM_X2.xyz.gz"), "wt") as f:
        f.write("")
    with open(os.path.join(raw, "tmQM_y.csv"), "w") as f:
        f.write("CSD_code;Electronic_E;Dispersion_E;Dipole_M;"
                "Metal_q;HL_Gap;HOMO_Energy;LUMO_Energy;Polarizability\n")
        f.write("ABC123;-1500.5;-0.05;2.5;0.8;0.11;-0.30;-0.19;120.0\n")

    dm = TMQM(dbpath, batch_size=2, raw_dir=raw)
    dm.prepare_data()
    ds = ASEAtomsData(dbpath)
    assert len(ds) == 1
    row = ds[0]
    np.testing.assert_array_equal(row["_atomic_numbers"], [26, 8, 8])
    np.testing.assert_allclose(np.ravel(row["electronic_energy"]), [-1500.5])
    np.testing.assert_allclose(np.ravel(row["gap"]), [0.11])


# -------------------------------------------------------- MaterialsProject
def test_materials_project_converter(tmp_path, monkeypatch):
    """The MP converter is driven through a stub MPRester (the real one
    needs network + pymatgen): asserts the query->DB conversion logic."""
    dbpath, raw = _mk(tmp_path, "mp.db")

    class _Sp:
        def __init__(self, Z):
            self.Z = Z

    class _Lattice:
        matrix = np.eye(3) * 4.0

    class _Structure:
        species = [_Sp(14), _Sp(8), _Sp(8)]
        cart_coords = np.array([[0.0, 0, 0], [1.2, 0, 0], [0, 1.2, 0]])
        lattice = _Lattice()

    class _MPRester:
        def __init__(self, apikey):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def query(self, criteria, properties):
            return [{
                "structure": _Structure(),
                "formation_energy_per_atom": -1.1,
                "energy_per_atom": -5.5,
                "band_gap": 0.9,
                "total_magnetization": 0.0,
            }]

    fake_pkg = types.ModuleType("pymatgen")
    fake_ext = types.ModuleType("pymatgen.ext")
    fake_mod = types.ModuleType("pymatgen.ext.matproj")
    fake_mod.MPRester = _MPRester
    monkeypatch.setitem(sys.modules, "pymatgen", fake_pkg)
    monkeypatch.setitem(sys.modules, "pymatgen.ext", fake_ext)
    monkeypatch.setitem(sys.modules, "pymatgen.ext.matproj", fake_mod)

    dm = MaterialsProject(dbpath, batch_size=2, raw_dir=raw, apikey="test")
    dm.prepare_data()
    ds = ASEAtomsData(dbpath)
    assert len(ds) == 1
    row = ds[0]
    np.testing.assert_array_equal(row["_atomic_numbers"], [14, 8, 8])
    np.testing.assert_allclose(np.ravel(row["band_gap"]), [0.9])
    np.testing.assert_allclose(row["_cell"], np.eye(3) * 4.0)

    # without an API key the converter refuses with actionable guidance
    with pytest.raises(RuntimeError, match="API key"):
        MaterialsProject(str(tmp_path / "mp2.db"), batch_size=2,
                         raw_dir=raw)._build_database()
