"""Inference interfaces: calculator, ensemble, batchwise LBFGS, AseInterface."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

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


def test_optimize_writes_trajectory_artifacts(potential, tmp_path):
    """AseInterface.optimize leaves resumable on-disk artifacts: an
    extxyz trajectory with energies+forces, an optimizer log, and the
    relaxed geometry — reloadable by our own reader (and ASE-compatible).
    Parity: reference ase_interface.py:759-800."""
    from schnetpack_tpu.datasets.xyz import read_extxyz_file

    pot, params = potential
    calc = SpkCalculator(pot, params, cutoff=CUTOFF)
    w = water()
    w[P.R] = w[P.R] + np.random.RandomState(1).rand(3, 3) * 0.05
    iface = AseInterface(w, calc, working_dir=str(tmp_path))
    info = iface.optimize(fmax=5e-3, steps=40)

    frames = read_extxyz_file(str(tmp_path / "optimization.extxyz"))
    assert len(frames) >= 2                       # initial + >=1 step
    np.testing.assert_array_equal(frames[0]["numbers"], [8, 1, 1])
    # the last trajectory frame is the relaxed geometry
    np.testing.assert_allclose(
        frames[-1]["positions"], np.asarray(iface.atoms[P.R]), atol=1e-8
    )
    # energies/forces embedded in the comment line / extra columns
    assert "energy=" in frames[0]["comment"]
    assert "forces" in frames[0]["comment"]
    final = read_extxyz_file(str(tmp_path / "optimization_final.extxyz"))
    np.testing.assert_allclose(
        final[0]["positions"], np.asarray(iface.atoms[P.R]), atol=1e-8
    )
    log = (tmp_path / "optimization.log").read_text().splitlines()
    assert log[0].startswith("BatchwiseLBFGS")
    assert len(log) == len(frames) + 1            # header + one per frame


def test_ase_interface_single_point_and_modes(potential):
    pot, params = potential
    calc = SpkCalculator(pot, params, cutoff=CUTOFF)
    iface = AseInterface(water(), calc)
    res = iface.calculate_single_point()
    assert "energy" in res
    freqs = iface.compute_normal_modes(delta=0.01)
    assert freqs.shape == (9,)
    assert np.isfinite(freqs).all()


class _QuadraticCalculator:
    """Analytic per-molecule quadratic well: E_m = 0.5*k_m*|R - R0_m|^2.

    Lets the LBFGS curvature test run without a network and gives each
    molecule a *different* Hessian, so any cross-sample curvature leakage
    changes the trajectories.
    """

    def __init__(self, ks, centers):
        self.ks = ks
        self.centers = centers

    def calculate(self, structures):
        es, fs = [], []
        for s, k, c in zip(structures, self.ks, self.centers):
            d = np.asarray(s[P.R], np.float64) - c
            es.append(0.5 * k * float((d ** 2).sum()))
            fs.append(-k * d)
        return np.array(es), fs


def test_batchwise_lbfgs_per_sample_curvature():
    """Relaxing [A, B] batched must give A the SAME trajectory as relaxing
    [A] alone — the reference keeps per-sample Hessian approximations
    (batchwise_optimization.py:613-917); a shared curvature history fails
    this because B's (very different) stiffness contaminates A's steps."""
    rng = np.random.RandomState(3)
    R0a, R0b = rng.randn(4, 3), rng.randn(6, 3)
    A = {P.Z: np.array([6] * 4), P.R: R0a + rng.randn(4, 3) * 0.4,
         P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool)}
    B = {P.Z: np.array([8] * 6), P.R: R0b + rng.randn(6, 3) * 0.4,
         P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool)}

    # stiffness ratio 50x: a shared history averages the two curvatures
    calc_both = _QuadraticCalculator([1.0, 50.0], [R0a, R0b])
    calc_a = _QuadraticCalculator([1.0], [R0a])

    kw = dict(fmax=1e-6, maxstep_total=60, memory=10)
    relaxed_both, info_both = batchwise_lbfgs(calc_both, [A, B], **kw)
    relaxed_a, info_a = batchwise_lbfgs(calc_a, [A], **kw)

    # block-diagonality: identical trajectory for A in both runs
    np.testing.assert_allclose(
        relaxed_both[0][P.R], relaxed_a[0][P.R], atol=1e-10)
    assert info_both["iterations"][0] == info_a["iterations"][0]
    # both molecules converge to their analytic minima
    np.testing.assert_allclose(relaxed_both[0][P.R], R0a, atol=1e-5)
    np.testing.assert_allclose(relaxed_both[1][P.R], R0b, atol=1e-5)


def test_ase_calculator_protocol(potential):
    """SpkCalculator implements the ASE Calculator protocol (VERDICT r4 #10):
    results dict, check_state/calculation_required invalidation, and an
    ASE-style BFGS relaxation driven purely through calc.get_* calls."""
    pot, params = potential
    calc = SpkCalculator(pot, params, cutoff=CUTOFF)
    from schnetpack_tpu.interfaces.ase_interface import CalculatorBase

    assert isinstance(calc, CalculatorBase)
    w = water()
    # fresh calculator requires calculation
    assert calc.calculation_required(w, ["energy"])
    e0 = calc.get_potential_energy(w)
    assert "energy" in calc.results and "forces" in calc.results
    # same structure: no recalculation needed, results served from cache
    assert not calc.calculation_required(w, ["energy", "forces"])
    assert calc.get_property("energy", w) == e0
    # perturb positions -> protocol must invalidate
    w2 = dict(w)
    w2[P.R] = w[P.R] + np.array([[0.0, 0, 0], [0.07, 0, 0], [0, 0, 0.03]])
    assert "positions" in calc.check_state(w2)
    assert calc.calculation_required(w2, ["energy"])
    e1 = calc.get_potential_energy(w2)
    assert e1 != e0

    # BFGS relaxation through the calculator protocol alone
    x = w[P.R].copy() + np.random.RandomState(0).randn(3, 3) * 0.02
    n = x.size
    H = np.eye(n) * 70.0  # ASE BFGS default alpha
    atoms = dict(w)
    atoms[P.R] = x
    f = calc.get_forces(atoms).reshape(-1)
    f0max = np.abs(f).max()
    for _ in range(25):
        if np.abs(f).max() < 1e-3:
            break
        dx = np.linalg.solve(H, f)
        steplen = np.linalg.norm(dx)
        if steplen > 0.04 * np.sqrt(n):
            dx *= 0.04 * np.sqrt(n) / steplen
        x_new = x + dx.reshape(3, 3)
        atoms = dict(atoms)
        atoms[P.R] = x_new
        f_new = calc.get_forces(atoms).reshape(-1)
        # BFGS update on (dx, df)
        df = f_new - f
        a = dx @ df
        if abs(a) > 1e-12:
            dg = H @ dx
            H = H - np.outer(df, df) / a - np.outer(dg, dg) / (dx @ dg)
        x, f = x_new.reshape(-1).reshape(3, 3), f_new
    assert np.abs(f).max() < f0max  # forces strictly reduced by relaxation
