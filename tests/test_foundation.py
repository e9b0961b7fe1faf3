"""Units, ops, neighbor lists, collate."""
import numpy as np
import pytest

from schnetpack_tpu import properties, units
from schnetpack_tpu.data.loader import PaddingSpec, collate, padding_for
from schnetpack_tpu.transform.neighborlist import (
    CollectAtomTriples,
    NeighborListTransform,
    neighbor_list,
)


class TestUnits:
    def test_known_conversions(self):
        assert units.convert_units("kcal/mol", "eV") == pytest.approx(0.04336414, rel=1e-5)
        assert units.convert_units("Hartree", "eV") == pytest.approx(27.211386, rel=1e-6)
        assert units.convert_units("Bohr", "Angstrom") == pytest.approx(0.52917721, rel=1e-6)
        assert units.kB == pytest.approx(8.6173303e-5, rel=1e-5)
        assert units.convert_units("kcal/mol/Angstrom", "eV/Bohr") == pytest.approx(
            0.04336414 * 0.52917721, rel=1e-5
        )
        assert units.Debye == pytest.approx(0.2081943, rel=1e-5)

    def test_md_frame(self):
        md = units.setup_md_units("kJ/mol", "nm", "Dalton", "e")
        # 1 eV in kJ/mol
        assert md.energy == pytest.approx(96.485332, rel=1e-5)
        # 1 Angstrom = 0.1 nm
        assert md.length == pytest.approx(0.1)
        # kB in kJ/mol/K
        assert md.kB == pytest.approx(0.0083144598, rel=1e-5)
        # time unit: ps-scale; 1 fs in internal units should be ~1e-2 ps... just check positive
        assert md.time > 0
        assert md.hbar2icm > 0
        # default frame (kJ/mol, nm, Dalton): internal time = 1 ps, so an
        # angular frequency of 1 ps^-1 is 1e12/(2 pi c) = 5.308 cm^-1
        assert md.hbar2icm == pytest.approx(5.308, rel=1e-3)

    def test_parse_powers(self):
        assert units.convert_units("Ang**2", "Bohr**2") == pytest.approx(
            (1.0 / 0.52917721) ** 2, rel=1e-5
        )


class TestOps:
    def test_cutoffs(self):
        import jax.numpy as jnp

        from schnetpack_tpu.ops.cutoff import cosine_cutoff, mollifier_cutoff, switch_function

        d = jnp.array([0.0, 2.5, 5.0, 7.0])
        c = cosine_cutoff(d, 5.0)
        assert c[0] == pytest.approx(1.0)
        assert c[1] == pytest.approx(0.5)
        assert float(c[2]) == pytest.approx(0.0, abs=1e-7)
        assert float(c[3]) == 0.0

        m = mollifier_cutoff(d, 5.0)
        assert m[0] == pytest.approx(1.0)
        assert float(m[3]) == 0.0

        s = switch_function(d, 2.0, 5.0)
        assert s[0] == pytest.approx(1.0)
        assert float(s[3]) == 0.0
        assert 0.0 < float(s[1]) < 1.0

    def test_cutoff_grad_finite(self):
        import jax
        import jax.numpy as jnp

        from schnetpack_tpu.ops.cutoff import cosine_cutoff, switch_function

        for fn in (lambda d: cosine_cutoff(d, 5.0).sum(), lambda d: switch_function(d, 2.0, 5.0).sum()):
            g = jax.grad(fn)(jnp.array([0.0, 2.0, 5.0, 1000.0]))
            assert np.all(np.isfinite(np.asarray(g)))

    def test_rbf(self):
        import jax.numpy as jnp

        from schnetpack_tpu.ops.radial import (
            bessel_rbf,
            bessel_rbf_params,
            gaussian_rbf,
            gaussian_rbf_params,
        )

        c, w = gaussian_rbf_params(20, 5.0)
        out = gaussian_rbf(jnp.array([1.0, 2.0]), jnp.asarray(c), jnp.asarray(w))
        assert out.shape == (2, 20)
        assert np.all(np.asarray(out) >= 0)
        assert np.asarray(out).max() > 0.5

        freqs = bessel_rbf_params(8, 5.0)
        b = bessel_rbf(jnp.array([0.0, 1.0]), jnp.asarray(freqs))
        assert b.shape == (2, 8)
        assert np.all(np.isfinite(np.asarray(b)))

    def test_shifted_softplus(self):
        import jax.numpy as jnp

        from schnetpack_tpu.ops.activations import shifted_softplus

        assert float(shifted_softplus(jnp.array(0.0))) == pytest.approx(0.0)

    def test_segment_sum_padding(self):
        import jax.numpy as jnp

        from schnetpack_tpu.ops.scatter import segment_sum

        x = jnp.array([1.0, 2.0, 3.0, 99.0])
        idx = jnp.array([0, 0, 1, 5])  # idx 5 out of range -> dropped
        out = segment_sum(x, idx, 3)
        np.testing.assert_allclose(np.asarray(out), [3.0, 3.0, 0.0])


class TestNeighborList:
    def test_dimer(self):
        R = np.array([[0.0, 0, 0], [1.0, 0, 0]])
        i, j, S = neighbor_list(R, 2.0)
        assert set(zip(i.tolist(), j.tolist())) == {(0, 1), (1, 0)}

    def test_cutoff_excludes(self):
        R = np.array([[0.0, 0, 0], [3.0, 0, 0]])
        i, j, S = neighbor_list(R, 2.0)
        assert len(i) == 0

    def test_simple_cubic_coordination(self, argon_crystal):
        a = 5.26
        out = NeighborListTransform(cutoff=a * 1.1)(dict(argon_crystal))
        idx_i = out[properties.idx_i]
        counts = np.bincount(idx_i, minlength=8)
        # simple cubic: 6 nearest neighbors each
        assert np.all(counts == 6)

    def test_pbc_distances_correct(self, argon_crystal):
        out = NeighborListTransform(cutoff=6.0)(dict(argon_crystal))
        R = argon_crystal[properties.R]
        Rij = R[out[properties.idx_j]] + out[properties.offsets] - R[out[properties.idx_i]]
        d = np.linalg.norm(Rij, axis=1)
        assert np.all(d < 6.0)
        assert np.all(d > 1e-10)
        np.testing.assert_allclose(np.unique(np.round(d, 6)), [5.26])

    def test_full_list_symmetry(self, rng):
        R = rng.rand(12, 3) * 5
        i, j, S = neighbor_list(R, 3.0)
        pairs = set(zip(i.tolist(), j.tolist()))
        assert all((b, a) in pairs for (a, b) in pairs)

    def test_triples(self, rng):
        from tests.conftest import random_molecule

        s = random_molecule(rng, 5, cutoff=10.0)  # fully connected: 4 nbrs each
        s = CollectAtomTriples()(s)
        # per center: C(4,2)=6 triples, 5 centers -> 30
        assert len(s[properties.idx_j_triples]) == 30


class TestCollate:
    def test_shapes_and_masks(self, molecule_batch):
        b = molecule_batch
        assert b[properties.Z].shape == (48,)
        assert b[properties.R].shape == (48, 3)
        total_atoms = 5 + 8 + 3 + 11
        assert b[properties.atom_mask].sum() == total_atoms
        assert b[properties.mol_mask].sum() == 4
        # padded atoms map to the padding molecule slot
        assert np.all(b[properties.idx_m][total_atoms:] == 5)
        # index dtype is int32 (TPU-native)
        assert b[properties.idx_i].dtype == np.int32

    def test_pair_index_shift(self, rng):
        from tests.conftest import random_molecule

        s1 = random_molecule(rng, 4)
        s2 = random_molecule(rng, 6)
        b = collate([s1, s2], padding_for([s1, s2]))
        n1 = len(s1[properties.idx_i])
        np.testing.assert_array_equal(b[properties.idx_i][:n1], s1[properties.idx_i])
        n2 = len(s2[properties.idx_i])
        np.testing.assert_array_equal(
            b[properties.idx_i][n1: n1 + n2], s2[properties.idx_i] + 4
        )

    def test_padded_pairs_are_far(self, molecule_batch):
        b = molecule_batch
        pm = b[properties.pair_mask]
        assert np.all(b[properties.offsets][pm == 0][:, 0] == 1e3)

    def test_per_molecule_property(self, rng):
        from tests.conftest import random_molecule

        s1 = random_molecule(rng, 4)
        s2 = random_molecule(rng, 6)
        s1["energy"] = np.array(-1.5)
        s2["energy"] = np.array(-2.5)
        s1["forces"] = np.zeros((4, 3))
        s2["forces"] = np.ones((6, 3))
        b = collate([s1, s2])
        assert b["energy"].shape[0] == b[properties.mol_mask].shape[0]
        np.testing.assert_allclose(b["energy"][:2], [-1.5, -2.5])
        assert b["forces"].shape == b[properties.R].shape
        np.testing.assert_allclose(b["forces"][4:10], 1.0)

    def test_dipole_on_triatomics_routes_per_molecule(self, rng):
        # a (3,) dipole target in a batch of 3-atom molecules (water) must
        # NOT be misrouted as a per-atom scalar property
        from tests.conftest import random_molecule

        s1 = random_molecule(rng, 3)
        s2 = random_molecule(rng, 3)
        s1["dipole_moment"] = np.array([0.1, 0.2, 0.3])
        s2["dipole_moment"] = np.array([0.4, 0.5, 0.6])
        b = collate([s1, s2])
        M = b[properties.mol_mask].shape[0]
        assert b["dipole_moment"].shape == (M, 3)
        np.testing.assert_allclose(b["dipole_moment"][0], [0.1, 0.2, 0.3])
        np.testing.assert_allclose(b["dipole_moment"][1], [0.4, 0.5, 0.6])


class TestBucketedLoader:
    def test_buckets_choose_smallest_fit(self, rng):
        from schnetpack_tpu.data.loader import AtomsLoader
        from tests.conftest import random_molecule

        small = [random_molecule(rng, 3) for _ in range(4)]
        big = [random_molecule(rng, 12) for _ in range(4)]

        class DS:
            def __init__(self, items): self.items = items
            def __len__(self): return len(self.items)
            def __getitem__(self, i): return self.items[i]

        buckets = [
            PaddingSpec(n_atoms=16, n_pairs=256, n_molecules=3),
            PaddingSpec(n_atoms=64, n_pairs=1024, n_molecules=3),
        ]
        loader = AtomsLoader(DS(small + big), batch_size=2,
                             padding_buckets=buckets)
        sizes = [b[properties.Z].shape[0] for b in loader]
        assert sizes[:2] == [16, 16]   # small molecules -> small bucket
        assert sizes[2:] == [64, 64]   # big molecules -> big bucket
