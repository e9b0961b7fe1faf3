"""Magnetic response properties via FieldSchNet: shielding, spin-spin."""
import jax
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import Atomwise, PairwiseDistances, Response
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import FieldSchNet
from tests.conftest import random_molecule

SPEC = PaddingSpec(16, 128, 2)


def test_shielding_and_spin_coupling(rng):
    pot = NeuralNetworkPotential(
        representation=FieldSchNet(
            n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=5.0,
            external_fields=[properties.magnetic_field],
            response_properties=[properties.shielding],
        ),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=properties.energy),
            Response(response_properties=[
                properties.shielding,
                properties.nuclear_spin_coupling,
            ]),
        ],
    )
    mol = random_molecule(rng, 4)
    b = collate([mol], SPEC)
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)

    sigma = np.asarray(out[properties.shielding])
    assert sigma.shape == (16, 3, 3)
    assert np.isfinite(sigma).all()
    # real atoms must couple to the field; padded atoms must not
    assert np.abs(sigma[:4]).max() > 0
    np.testing.assert_allclose(sigma[4:], 0.0, atol=1e-8)

    J = np.asarray(out[properties.nuclear_spin_coupling])
    assert J.shape == (16, 3, 16, 3)
    assert np.isfinite(J).all()
    # coupling tensor is symmetric under (a,i) <-> (b,j)
    J_perm = np.transpose(J, (2, 3, 0, 1))
    np.testing.assert_allclose(J, J_perm, rtol=1e-3, atol=1e-6)
