"""Inference interfaces: calculator, ensemble, batchwise LBFGS, AseInterface."""
import jax
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.interfaces import (
    AseInterface,
    AtomsConverter,
    BatchwiseCalculator,
    SpkCalculator,
    SpkEnsembleCalculator,
    batchwise_lbfgs,
)
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from tests.conftest import random_molecule

CUTOFF = 5.0


@pytest.fixture(scope="module")
def potential(rng):
    pot = NeuralNetworkPotential(
        representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    mol = random_molecule(rng, 5)
    params = pot.init(jax.random.PRNGKey(0), collate([mol], PaddingSpec(16, 128, 2)))
    return pot, params


def water():
    return {
        P.Z: np.array([8, 1, 1]),
        P.R: np.array([[0.0, 0, 0], [0.76, 0.59, 0], [-0.76, 0.59, 0]]),
        P.cell: np.zeros((3, 3)),
        P.pbc: np.zeros(3, bool),
    }


def test_converter_buckets(potential):
    conv = AtomsConverter(cutoff=CUTOFF)
    b1 = conv(water())
    assert b1[P.Z].shape[0] % 16 == 0
    # two structures in one batch
    b2 = conv([water(), water()])
    assert float(b2[P.mol_mask].sum()) == 2


def test_calculator_energy_forces(potential):
    pot, params = potential
    calc = SpkCalculator(pot, params, cutoff=CUTOFF)
    res = calc.calculate(water())
    assert np.isfinite(res["energy"])
    assert res["forces"].shape == (3, 3)
    # cache: same structure returns same object
    res2 = calc.calculate(water())
    assert res2 is calc.results
    # duck-typed ase surface
    assert calc.get_potential_energy(water()) == res["energy"]


def test_unit_conversion(potential):
    pot, params = potential
    calc_ev = SpkCalculator(pot, params, cutoff=CUTOFF, energy_unit="eV")
    calc_ha = SpkCalculator(pot, params, cutoff=CUTOFF, energy_unit="Hartree")
    e_ev = calc_ev.calculate(water())["energy"]
    e_ha = calc_ha.calculate(water())["energy"]
    assert e_ha == pytest.approx(e_ev * 27.211386, rel=1e-5)


def test_ensemble_calculator(potential, rng):
    pot, params = potential
    mol = random_molecule(rng, 5)
    params2 = pot.init(jax.random.PRNGKey(9), collate([mol], PaddingSpec(16, 128, 2)))
    calc = SpkEnsembleCalculator(pot, [params, params2], cutoff=CUTOFF)
    res = calc.calculate(water())
    assert "energy_uncertainty" in res and "forces_uncertainty" in res
    assert res["forces_uncertainty"].shape == (3, 3)
    assert float(np.max(res["forces_uncertainty"])) > 0


def test_batchwise_lbfgs_reduces_forces(potential):
    pot, params = potential
    conv = AtomsConverter(cutoff=CUTOFF)
    bc = BatchwiseCalculator(pot, params, conv)
    rng = np.random.RandomState(0)
    structures = []
    for seed in range(3):
        w = water()
        w[P.R] = w[P.R] + rng.rand(3, 3) * 0.1
        structures.append(w)
    e0, f0 = bc.calculate(structures)
    relaxed, info = batchwise_lbfgs(bc, structures, fmax=1e-3, maxstep_total=80)
    e1, f1 = bc.calculate(relaxed)
    assert info["fmax"].max() < np.concatenate(f0).max() + 1e-12
    assert (e1 <= e0 + 1e-6).all()
    # forces actually reduced substantially
    assert info["fmax"].max() < 0.5 * max(np.abs(np.concatenate(f0)).max(), 1e-9)


def test_ase_interface_single_point_and_modes(potential):
    pot, params = potential
    calc = SpkCalculator(pot, params, cutoff=CUTOFF)
    iface = AseInterface(water(), calc)
    res = iface.calculate_single_point()
    assert "energy" in res
    freqs = iface.compute_normal_modes(delta=0.01)
    assert freqs.shape == (9,)
    assert np.isfinite(freqs).all()
