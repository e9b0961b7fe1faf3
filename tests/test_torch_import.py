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
