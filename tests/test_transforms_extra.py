"""Remaining transforms: offsets, casting, skin/cached NBL, shielding split."""
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.transform import (
    CastTo32,
    CountNeighbors,
    FilterNeighbors,
    RemoveOffsets,
    SkinNeighborList,
    SubtractCenterOfMass,
    WrapPositions,
)
from schnetpack_tpu.transform.neighborlist import CachedNeighborList, NeighborListTransform
from schnetpack_tpu.transform.response import SplitShielding
from tests.conftest import random_molecule


def test_remove_offsets_atomrefs_and_mean(rng):
    s = random_molecule(rng, 5)
    s["energy"] = np.array(-100.0)
    refs = np.zeros(101)
    refs[1:9] = -10.0
    t = RemoveOffsets("energy", remove_atomrefs=True, atomrefs=refs,
                      remove_mean=True, property_mean=1.0)
    out = t(dict(s))
    expected = -100.0 - 5 * (-10.0) - 5 * 1.0
    assert float(out["energy"]) == pytest.approx(expected)


def test_add_offsets_inverts_remove(rng):
    import jax.numpy as jnp

    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.transform import AddOffsets

    s = random_molecule(rng, 5)
    s["energy"] = np.array(-100.0)
    refs = np.zeros(101)
    refs[1:9] = -10.0
    rm = RemoveOffsets("energy", remove_atomrefs=True, atomrefs=refs)
    add = AddOffsets("energy", add_atomrefs=True, atomrefs=refs)
    removed = rm(dict(s))
    batch = collate([removed], PaddingSpec(16, 128, 2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    restored = add(dict(batch))
    assert float(restored["energy"][0]) == pytest.approx(-100.0, rel=1e-6)


def test_subtract_com(rng):
    s = random_molecule(rng, 5)
    out = SubtractCenterOfMass()(dict(s))
    from schnetpack_tpu.transform.atomistic import ATOMIC_MASSES

    m = ATOMIC_MASSES[out[P.Z]]
    com = (m[:, None] * out[P.R]).sum(0) / m.sum()
    np.testing.assert_allclose(com, 0.0, atol=1e-10)


def test_cast_to_32(rng):
    s = random_molecule(rng, 4)
    out = CastTo32()(dict(s))
    assert out[P.R].dtype == np.float32
    assert out[P.idx_i].dtype == np.int32


def test_count_neighbors_and_filter(rng):
    s = random_molecule(rng, 5, cutoff=10.0)
    s = CountNeighbors()(s)
    np.testing.assert_array_equal(s[P.n_nbh], [4, 4, 4, 4, 4])
    f = FilterNeighbors([0, 1, 2])(dict(s))
    assert set(f[P.idx_i]) <= {0, 1, 2}
    assert set(f[P.idx_j]) <= {0, 1, 2}


def test_wrap_positions(argon_crystal):
    s = dict(argon_crystal)
    s[P.R] = s[P.R] + 20.0  # push outside the cell
    out = WrapPositions()(s)
    frac = out[P.R] @ np.linalg.inv(s[P.cell])
    assert (frac >= -1e-9).all() and (frac < 1.0).all()


def test_skin_neighborlist_caches(rng):
    base = NeighborListTransform(5.0)
    skin = SkinNeighborList(base, skin=1.0)
    s = random_molecule(rng, 5)
    s.pop(P.idx_i, None), s.pop(P.idx_j, None), s.pop(P.offsets, None)
    out1 = skin(dict(s))
    idx1 = out1[P.idx_i]
    # tiny move: cache reused (identical object)
    s2 = dict(s)
    s2[P.R] = s[P.R] + 1e-4
    out2 = skin(s2)
    assert out2[P.idx_i] is idx1
    # big move: rebuild
    s3 = dict(s)
    s3[P.R] = s[P.R] * 1.5
    out3 = skin(s3)
    assert out3[P.idx_i] is not idx1


def test_cached_neighborlist(tmp_path, rng):
    base = NeighborListTransform(5.0)
    cached = CachedNeighborList(str(tmp_path / "nblcache"), base, keep_cache=True)
    s = random_molecule(rng, 5)
    s[P.idx] = np.array([7])
    for k in (P.idx_i, P.idx_j, P.offsets):
        s.pop(k, None)
    out1 = cached(dict(s))
    import os

    assert os.path.exists(tmp_path / "nblcache" / "nbl_7.npz")
    out2 = cached(dict(s))
    np.testing.assert_array_equal(out1[P.idx_i], out2[P.idx_i])


def test_split_shielding(rng):
    s = random_molecule(rng, 4)
    s[P.Z] = np.array([1, 6, 1, 8])
    s[P.shielding] = rng.rand(4, 3, 3)
    out = SplitShielding(atomic_numbers=[1, 6, 8])(dict(s))
    np.testing.assert_allclose(out["shielding_1"][0], s[P.shielding][0])
    np.testing.assert_allclose(out["shielding_1"][1], 0.0)
    np.testing.assert_allclose(out["shielding_6"][1], s[P.shielding][1])
