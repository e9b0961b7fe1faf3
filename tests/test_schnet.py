"""SchNet representation + NeuralNetworkPotential: physics invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from tests.conftest import random_molecule

CUTOFF = 5.0


def make_potential(calc_forces=True, calc_stress=False):
    return NeuralNetworkPotential(
        representation=SchNet(n_atom_basis=32, n_interactions=2, n_rbf=10, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=properties.energy, n_out=1),
            Forces(calc_forces=calc_forces, calc_stress=calc_stress),
        ],
    )


@pytest.fixture(scope="module")
def potential_and_params(rng):
    pot = make_potential()
    batch = collate([random_molecule(rng, 7)], PaddingSpec(16, 128, 2))
    params = pot.init(jax.random.PRNGKey(0), batch)
    return pot, params


def test_forward_shapes(potential_and_params, rng):
    pot, params = potential_and_params
    batch = collate([random_molecule(rng, 7)], PaddingSpec(16, 128, 2))
    out = pot.apply(params, batch)
    assert out[properties.energy].shape == (2,)
    assert out[properties.forces].shape == (16, 3)
    # padded molecule has exactly zero energy contribution from padded atoms?
    # padded atoms are masked in Atomwise, so the pad-molecule energy must be 0
    assert float(out[properties.energy][1]) == pytest.approx(0.0, abs=1e-6)
    # padded atom forces are masked to zero
    np.testing.assert_allclose(np.asarray(out[properties.forces][7:]), 0.0, atol=1e-6)


def test_padding_invariance(potential_and_params, rng):
    """Same molecule, different padding budgets -> identical outputs."""
    pot, params = potential_and_params
    mol = random_molecule(rng, 7)
    small = collate([mol], PaddingSpec(16, 128, 2))
    big = collate([mol], PaddingSpec(64, 512, 5))
    e1 = pot.apply(params, small)[properties.energy][0]
    e2 = pot.apply(params, big)[properties.energy][0]
    assert float(e1) == pytest.approx(float(e2), rel=1e-5)


def test_batching_invariance(potential_and_params, rng):
    """Molecule alone vs inside a batch -> identical energy/forces."""
    pot, params = potential_and_params
    m1, m2 = random_molecule(rng, 7), random_molecule(rng, 5)
    alone = pot.apply(params, collate([m1], PaddingSpec(16, 128, 2)))
    both = pot.apply(params, collate([m1, m2], PaddingSpec(32, 256, 3)))
    assert float(alone[properties.energy][0]) == pytest.approx(
        float(both[properties.energy][0]), rel=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(alone[properties.forces][:7]),
        np.asarray(both[properties.forces][:7]),
        rtol=1e-4, atol=1e-6,
    )


def test_rotation_invariance(potential_and_params, rng):
    pot, params = potential_and_params
    mol = random_molecule(rng, 7)
    e0 = pot.apply(params, collate([mol], PaddingSpec(16, 128, 2)))[properties.energy][0]

    # random rotation
    theta = 0.7
    Rz = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    rot = dict(mol)
    rot[properties.R] = mol[properties.R] @ Rz.T
    rot = NeighborListTransform(CUTOFF)(rot)
    e1 = pot.apply(params, collate([rot], PaddingSpec(16, 128, 2)))[properties.energy][0]
    assert float(e0) == pytest.approx(float(e1), rel=1e-4)


def test_translation_invariance_and_zero_net_force(potential_and_params, rng):
    pot, params = potential_and_params
    mol = random_molecule(rng, 7)
    out0 = pot.apply(params, collate([mol], PaddingSpec(16, 128, 2)))
    shifted = dict(mol)
    shifted[properties.R] = mol[properties.R] + np.array([1.0, -2.0, 0.5])
    shifted = NeighborListTransform(CUTOFF)(shifted)
    out1 = pot.apply(params, collate([shifted], PaddingSpec(16, 128, 2)))
    assert float(out0[properties.energy][0]) == pytest.approx(
        float(out1[properties.energy][0]), rel=1e-5
    )
    # translation invariance => forces sum to zero
    net = np.asarray(out0[properties.forces]).sum(axis=0)
    np.testing.assert_allclose(net, 0.0, atol=1e-4)


def test_forces_match_finite_differences(potential_and_params, rng):
    """FD check in float64 (f32 energy rounding would swamp the FD signal)."""
    pot, params = potential_and_params
    mol = random_molecule(rng, 5)
    spec = PaddingSpec(16, 128, 2)

    with jax.enable_x64():
        params64 = jax.tree.map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        batch = collate([mol], spec, float_dtype=np.float64)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        out = pot.apply(params64, batch)
        F = np.asarray(out[properties.forces])[:5]

        def energy_at(R):
            b = dict(batch)
            b[properties.R] = jnp.asarray(R)
            return float(pot.apply(params64, b)[properties.energy][0])

        h = 1e-5
        R0 = np.asarray(batch[properties.R], dtype=np.float64)
        for (a, d) in [(0, 0), (2, 1), (4, 2)]:
            Rp, Rm = R0.copy(), R0.copy()
            Rp[a, d] += h
            Rm[a, d] -= h
            fd = -(energy_at(Rp) - energy_at(Rm)) / (2 * h)
            assert F[a, d] == pytest.approx(fd, rel=1e-5, abs=1e-9)


def test_jit_apply(potential_and_params, rng):
    pot, params = potential_and_params
    batch = collate([random_molecule(rng, 7)], PaddingSpec(16, 128, 2))
    jitted = jax.jit(pot.apply)
    out = jitted(params, batch)
    out2 = pot.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(out[properties.energy]), np.asarray(out2[properties.energy]),
        rtol=1e-5, atol=1e-6,
    )
