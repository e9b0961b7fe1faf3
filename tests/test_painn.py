"""PaiNN: equivariance and dipole/polarizability heads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import (
    Atomwise,
    DipoleMoment,
    Forces,
    PairwiseDistances,
    Polarizability,
)
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation.painn import PaiNN
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from tests.conftest import random_molecule

CUTOFF = 5.0
SPEC = PaddingSpec(16, 128, 2)


@pytest.fixture(scope="module")
def painn_potential(rng):
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=properties.energy),
            DipoleMoment(use_vector_representation=True),
            Forces(),
        ],
    )
    mol = random_molecule(rng, 6)
    params = pot.init(jax.random.PRNGKey(1), collate([mol], SPEC))
    return pot, params, mol


def _rotation():
    a, b = 0.6, -1.1
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]])
    return Rz @ Rx


def test_energy_invariant_dipole_equivariant(painn_potential):
    """Run in f64: f32 cancellation noise would mask true equivariance."""
    pot, params, mol = painn_potential
    with jax.enable_x64():
        params64 = jax.tree.map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )

        def run(m):
            b = collate([m], SPEC, float_dtype=np.float64)
            return pot.apply(params64, {k: jnp.asarray(v) for k, v in b.items()})

        out0 = run(mol)
        Q = _rotation()
        rot = dict(mol)
        rot[properties.R] = mol[properties.R] @ Q.T
        rot = NeighborListTransform(CUTOFF)(rot)
        out1 = run(rot)

        assert float(out0[properties.energy][0]) == pytest.approx(
            float(out1[properties.energy][0]), rel=1e-10
        )
        mu0 = np.asarray(out0[properties.dipole_moment][0])
        mu1 = np.asarray(out1[properties.dipole_moment][0])
        np.testing.assert_allclose(Q @ mu0, mu1, rtol=1e-8, atol=1e-12)
        F0 = np.asarray(out0[properties.forces][:6])
        F1 = np.asarray(out1[properties.forces][:6])
        np.testing.assert_allclose(F0 @ Q.T, F1, rtol=1e-8, atol=1e-12)


def test_charge_sum_correction(painn_potential):
    pot, params, mol = painn_potential
    out = pot.apply(params, collate([mol], SPEC))
    q = np.asarray(out[properties.partial_charges])
    # neutral molecule: charges sum to zero (within f32)
    assert q[:6].sum() == pytest.approx(0.0, abs=1e-5)
    # padded atoms carry no charge
    np.testing.assert_allclose(q[6:], 0.0, atol=1e-7)


def test_polarizability_symmetric(rng):
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Polarizability()],
    )
    mol = random_molecule(rng, 6)
    b = collate([mol], SPEC)
    params = pot.init(jax.random.PRNGKey(2), b)
    out = pot.apply(params, b)
    alpha = np.asarray(out[properties.polarizability][0])
    assert alpha.shape == (3, 3)
    np.testing.assert_allclose(alpha, alpha.T, rtol=1e-5, atol=1e-6)


def test_vector_representation_zero_for_isolated_atom(rng):
    """An atom with no neighbors must have zero vector features."""
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=properties.energy)],
    )
    mol = {
        properties.Z: np.array([6]),
        properties.R: np.zeros((1, 3)),
        properties.cell: np.zeros((3, 3)),
        properties.pbc: np.zeros(3, bool),
    }
    mol = NeighborListTransform(CUTOFF)(mol)
    b = collate([mol], PaddingSpec(4, 16, 2))
    params = pot.init(jax.random.PRNGKey(3), b)
    out = pot.core.apply(params, {k: jnp.asarray(v) for k, v in b.items()})
    mu = np.asarray(out[properties.vector_representation])
    np.testing.assert_allclose(mu, 0.0, atol=1e-7)
