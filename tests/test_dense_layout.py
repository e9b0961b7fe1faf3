"""Dense neighbor-matrix layout: exact consistency with the flat pair list."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import PaiNN, SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from tests.conftest import random_molecule

CUTOFF = 5.0
FLAT_SPEC = PaddingSpec(32, 256, 3)
DENSE_SPEC = PaddingSpec(32, 256, 3, n_neighbors=16)


def test_collate_dense_structure(rng, argon_crystal):
    s = NeighborListTransform(6.0)(dict(argon_crystal))
    spec = PaddingSpec(16, 256, 2, n_neighbors=24)
    b = collate([s], spec)
    nbh = b[properties.nbh_idx]
    mask = b[properties.nbh_mask]
    # counts match flat list
    flat_counts = np.bincount(
        b[properties.idx_i][b[properties.pair_mask] > 0], minlength=16
    )
    np.testing.assert_array_equal(mask.sum(1)[:8], flat_counts[:8])
    # reconstructed pairs agree (as sets with offsets)
    R = b[properties.R]
    Rij_dense = R[nbh] + b[properties.nbh_offsets] - R[:, None]
    d_dense = np.linalg.norm(Rij_dense, axis=-1)
    assert (d_dense[mask > 0] < 6.0).all()


@pytest.mark.parametrize("rep_cls", [SchNet, PaiNN])
def test_flat_vs_dense_equivalence(rep_cls, rng):
    mols = [random_molecule(rng, 6), random_molecule(rng, 4)]
    pot = NeuralNetworkPotential(
        representation=rep_cls(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=properties.energy), Forces()],
    )
    b_flat = collate(mols, FLAT_SPEC)
    b_dense = collate(mols, DENSE_SPEC)
    params = pot.init(jax.random.PRNGKey(0), b_flat)

    out_flat = pot.apply(params, b_flat)
    out_dense = pot.apply(params, b_dense)
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.energy][:2]),
        np.asarray(out_dense[properties.energy][:2]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.forces][:10]),
        np.asarray(out_dense[properties.forces][:10]),
        rtol=1e-4, atol=1e-5,
    )


def test_so3net_flat_vs_dense(rng):
    from schnetpack_tpu.representation import SO3net

    mols = [random_molecule(rng, 6), random_molecule(rng, 4)]
    pot = NeuralNetworkPotential(
        representation=SO3net(n_atom_basis=16, n_interactions=2, lmax=2,
                              n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=properties.energy), Forces()],
    )
    b_flat = collate(mols, FLAT_SPEC)
    b_dense = collate(mols, DENSE_SPEC)
    params = pot.init(jax.random.PRNGKey(0), b_flat)
    out_flat = pot.apply(params, b_flat)
    out_dense = pot.apply(params, b_dense)
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.energy][:2]),
        np.asarray(out_dense[properties.energy][:2]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.forces][:10]),
        np.asarray(out_dense[properties.forces][:10]),
        rtol=1e-4, atol=1e-5,
    )


def test_stress_flat_vs_dense(argon_crystal):
    """Stress via strain reparameterization must agree between layouts
    (the Strain module also transforms the dense nbh_offsets)."""
    import jax

    with jax.enable_x64():
        s = NeighborListTransform(6.0)(dict(argon_crystal))
        pot = NeuralNetworkPotential(
            representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=6.0),
            input_modules=[PairwiseDistances()],
            output_modules=[
                Atomwise(output_key=properties.energy),
                Forces(calc_forces=True, calc_stress=True),
            ],
        )
        flat_spec = PaddingSpec(16, 512, 2)
        dense_spec = PaddingSpec(16, 512, 2, n_neighbors=32)
        b_flat = collate([s], flat_spec, float_dtype=np.float64)
        b_dense = collate([s], dense_spec, float_dtype=np.float64)
        params = pot.init(jax.random.PRNGKey(0), b_flat)
        import jax.numpy as jnp

        params = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params,
        )
        out_flat = pot.apply(params, {k: jnp.asarray(v) for k, v in b_flat.items()})
        out_dense = pot.apply(params, {k: jnp.asarray(v) for k, v in b_dense.items()})
        np.testing.assert_allclose(
            np.asarray(out_flat[properties.stress][0]),
            np.asarray(out_dense[properties.stress][0]),
            rtol=1e-8, atol=1e-12,
        )
        assert np.abs(np.asarray(out_dense[properties.stress][0])).max() > 1e-8
