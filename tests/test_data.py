"""Data layer: ASE-DB round trip, reference-DB compatibility, datamodule."""
import os

import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.data import (
    ASEAtomsData,
    AtomsDataModule,
    calculate_stats,
    estimate_atomrefs,
    random_split,
)

REFERENCE_DB = "/root/reference/tests/testdata/test_qm9.db"


class TestASEDBCompat:
    @pytest.mark.skipif(not os.path.exists(REFERENCE_DB), reason="no reference db")
    def test_read_reference_db(self):
        ds = ASEAtomsData(REFERENCE_DB)
        assert len(ds) > 0
        s = ds[0]
        assert s[properties.Z].tolist() == [6, 1, 1, 1, 1]  # methane
        assert s[properties.R].shape == (5, 3)
        assert "energy_U0" in s
        assert "dipole_moment" in s
        # scalar properties decoded as 0-d
        assert np.asarray(s["energy_U0"]).shape == ()

    @pytest.mark.skipif(not os.path.exists(REFERENCE_DB), reason="no reference db")
    def test_unit_conversion(self):
        ds_ha = ASEAtomsData(REFERENCE_DB)
        ds_ev = ASEAtomsData(REFERENCE_DB, property_units={"energy_U0": "eV"})
        e_ha = float(ds_ha[0]["energy_U0"])
        e_ev = float(ds_ev[0]["energy_U0"])
        assert e_ev == pytest.approx(e_ha * 27.211386, rel=1e-6)

    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "test.db")
        ds = ASEAtomsData.create(
            path,
            distance_unit="Ang",
            property_unit_dict={"energy": "eV", "forces": "eV/Ang"},
            atomrefs={"energy": np.zeros(101)},
        )
        systems = []
        for i in range(5):
            n = int(rng.randint(3, 8))
            systems.append(
                dict(
                    numbers=rng.randint(1, 9, n),
                    positions=rng.rand(n, 3) * 3,
                    energy=np.array([-float(i)]),
                    forces=rng.rand(n, 3),
                )
            )
        ds.add_systems(systems)
        ds2 = ASEAtomsData(path)
        assert len(ds2) == 5
        s = ds2[2]
        assert float(s["energy"]) == -2.0
        np.testing.assert_allclose(s["forces"], systems[2]["forces"])
        assert ds2.units["energy"] == "eV"
        assert "energy" in ds2.atomrefs

    def test_subset(self, tmp_path, rng):
        path = str(tmp_path / "sub.db")
        ds = ASEAtomsData.create(path, property_unit_dict={"energy": "eV"})
        ds.add_systems(
            [
                dict(numbers=[1, 1], positions=np.zeros((2, 3)), energy=np.array([float(i)]))
                for i in range(10)
            ]
        )
        ds = ASEAtomsData(path)
        sub = ds.subset([3, 5, 7])
        assert len(sub) == 3
        assert float(sub[1]["energy"]) == 5.0


class TestSplitting:
    def test_random_split(self):
        tr, va, te = random_split(100, 70, 10, None, seed=1)
        assert len(tr) == 70 and len(va) == 10 and len(te) == 20
        assert len(set(tr) | set(va) | set(te)) == 100

    def test_fractional(self):
        tr, va, te = random_split(100, 0.5, 0.2, None, seed=1)
        assert len(tr) == 50 and len(va) == 20 and len(te) == 30


class TestStats:
    def _make_ds(self, tmp_path, rng):
        path = str(tmp_path / "stats.db")
        ds = ASEAtomsData.create(path, property_unit_dict={"energy": "eV"})
        systems = []
        for _ in range(20):
            n = int(rng.randint(2, 6))
            Z = rng.randint(1, 4, n)
            # energy = sum of per-element refs + noise
            refs = np.array([0.0, -1.0, -2.0, -3.0])
            e = refs[Z].sum() + rng.randn() * 0.01
            systems.append(dict(numbers=Z, positions=rng.rand(n, 3), energy=np.array([e])))
        ds.add_systems(systems)
        return ASEAtomsData(path)

    def test_estimate_atomrefs(self, tmp_path, rng):
        ds = self._make_ds(tmp_path, rng)
        w = estimate_atomrefs(ds, "energy", z_max=5)
        np.testing.assert_allclose(w[1:4], [-1.0, -2.0, -3.0], atol=0.05)

    def test_calculate_stats(self, tmp_path, rng):
        ds = self._make_ds(tmp_path, rng)
        stats = calculate_stats(ds, {"energy": True})
        mean, std = stats["energy"]
        assert -3.0 < mean < -1.0  # per-atom energies in [-3, -1]


class TestDataModule:
    def test_setup_and_loaders(self, tmp_path, rng):
        from schnetpack_tpu.transform.neighborlist import NeighborListTransform

        path = str(tmp_path / "dm.db")
        ds = ASEAtomsData.create(path, property_unit_dict={"energy": "eV"})
        systems = []
        for _ in range(20):
            n = int(rng.randint(3, 7))
            systems.append(
                dict(numbers=rng.randint(1, 9, n), positions=rng.rand(n, 3) * 3,
                     energy=np.array([rng.randn()]))
            )
        ds.add_systems(systems)

        dm = AtomsDataModule(
            path, batch_size=4, num_train=10, num_val=5, num_test=None,
            split_file=str(tmp_path / "split.npz"),
            transforms=[NeighborListTransform(5.0)],
        )
        dm.setup()
        assert len(dm.train_dataset) == 10
        assert len(dm.val_dataset) == 5
        assert len(dm.test_dataset) == 5
        batch = next(iter(dm.train_dataloader()))
        assert properties.idx_i in batch
        assert batch[properties.mol_mask].sum() == 4
        # split file persisted and reused
        dm2 = AtomsDataModule(
            path, batch_size=4, num_train=10, num_val=5,
            split_file=str(tmp_path / "split.npz"),
            transforms=[NeighborListTransform(5.0)],
        )
        dm2.setup()
        assert dm2.train_idx == dm.train_idx


class TestDatasetParsers:
    def test_qm9_xyz_parser(self):
        from schnetpack_tpu.datasets.qm9 import parse_qm9_xyz

        text = (
            "3\n"
            "gdb 1\t157.7  157.7  157.7  0.0  13.21  -0.3877  0.1171  0.5048  "
            "35.36  0.044749  -40.4789  -40.476  -40.4751  -40.4986  6.469\n"
            "C\t-0.012\t1.086\t0.008\t-0.5\n"
            "H\t0.002*^-2\t-0.006\t0.002\t0.13\n"
            "H\t1.012\t1.464\t0.0\t0.13\n"
        )
        Z, R, props = parse_qm9_xyz(text)
        np.testing.assert_array_equal(Z, [6, 1, 1])
        assert R.shape == (3, 3)
        assert R[1, 0] == pytest.approx(0.002e-2)  # *^ exponent handled
        assert float(props["energy_U0"]) == pytest.approx(-40.4789)
        assert float(props["gap"]) == pytest.approx(0.5048)
        assert float(props["heat_capacity"]) == pytest.approx(6.469)

    def test_extxyz_parser_with_lattice(self):
        from schnetpack_tpu.datasets.xyz import parse_extxyz_blocks

        text = (
            '2\nLattice="10 0 0 0 10 0 0 0 10" Properties=species:S:1:pos:R:3\n'
            "Si 0.0 0.0 0.0\nSi 1.35 1.35 1.35\n"
            "1\nplain comment\nAr 0 0 0\n"
        )
        blocks = list(parse_extxyz_blocks(text))
        assert len(blocks) == 2
        np.testing.assert_array_equal(blocks[0]["numbers"], [14, 14])
        np.testing.assert_allclose(blocks[0]["cell"], np.eye(3) * 10)
        assert "cell" not in blocks[1]
