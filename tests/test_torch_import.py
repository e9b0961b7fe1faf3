"""Weight import from reference-trained torch models (migration path)."""
import os

import numpy as np
import pytest

MODEL = "/root/reference/tests/testdata/md_ethanol.model"
XYZ = "/root/reference/tests/testdata/md_ethanol.xyz"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(MODEL) and os.path.exists(XYZ)),
    reason="reference testdata not available",
)

KCAL = 0.04336414  # eV


@pytest.fixture(scope="module")
def imported():
    from schnetpack_tpu.interfaces.torch_import import import_torch_model

    return import_torch_model(MODEL)


def test_metadata(imported):
    pot, params, info = imported
    assert info["representation"] == "PaiNN"
    assert info["n_atom_basis"] == 128
    assert info["n_interactions"] == 3
    assert info["cutoff"] == 5.0


def test_reproduces_md17_energy_scale(imported):
    """The reference model was trained on MD17 ethanol (energies around
    -97,210 kcal/mol).  A correct weight mapping must reproduce that scale
    on the shipped ethanol geometry; a wrong mapping would be tens of
    kcal/mol off through the trained NN head."""
    from schnetpack_tpu.interfaces import SpkCalculator
    from schnetpack_tpu.md.cli import load_structures

    pot, params, info = imported
    mol = load_structures(XYZ)[0]
    calc = SpkCalculator(pot, params, cutoff=info["cutoff"], energy_unit="kcal/mol")
    res = calc.calculate(mol)
    e_kcal = res["energy"] / KCAL
    assert -97220.0 < e_kcal < -97195.0
    fmax = np.abs(res["forces"]).max() / KCAL
    assert 0.5 < fmax < 100.0  # thermal geometry: O(10) kcal/mol/A


def test_imported_model_physics(imported):
    """Rotation invariance + zero net force hold for the imported weights."""
    from schnetpack_tpu.interfaces import SpkCalculator
    from schnetpack_tpu.md.cli import load_structures
    from schnetpack_tpu import properties as P

    pot, params, info = imported
    mol = load_structures(XYZ)[0]
    calc = SpkCalculator(pot, params, cutoff=info["cutoff"], energy_unit="kcal/mol")
    e0 = calc.calculate(mol)["energy"]
    F = calc.calculate(mol)["forces"]
    np.testing.assert_allclose(F.sum(0) / KCAL, 0.0, atol=0.05)

    th = 0.8
    Q = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    rot = dict(mol)
    rot[P.R] = mol[P.R] @ Q.T
    e1 = SpkCalculator(pot, params, cutoff=info["cutoff"], energy_unit="kcal/mol").calculate(rot)["energy"]
    assert e1 == pytest.approx(e0, abs=0.05 * KCAL)


def test_imported_model_nve_conservation(imported):
    """NVE MD with the real trained PES conserves energy — dynamical proof
    that forces are the exact gradient of the imported energy surface."""
    import jax
    import jax.numpy as jnp

    from schnetpack_tpu.md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.md.cli import load_structures

    pot, params, info = imported
    with jax.enable_x64():
        params64 = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params,
        )
        mol = load_structures(XYZ)[0]
        system = load_molecules([mol], dtype=jnp.float64)
        system = MaxwellBoltzmannInit(300.0).initialize_system(
            system, jax.random.PRNGKey(0)
        )
        calc = SchNetPackCalculator(
            pot, params64, cutoff=info["cutoff"], energy_unit="kcal/mol",
        )
        sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False)
        s0 = sim.state.system
        e0 = float(jnp.sum(s0.energy) + jnp.sum(s0.kinetic_energy))
        sim.simulate(200, chunk_size=100)
        s1 = sim.state.system
        e1 = float(jnp.sum(s1.energy) + jnp.sum(s1.kinetic_energy))
        ke = float(jnp.sum(s0.kinetic_energy))
        assert abs(e1 - e0) < 0.02 * ke  # drift well under 2% of KE
