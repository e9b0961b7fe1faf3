"""Inference interfaces: structure conversion, calculators, ASE bridge.

Parity: ``src/schnetpack/interfaces/ase_interface.py`` — ``AtomsConverter``
(structures -> batched model inputs, :55-158), ``SpkCalculator`` (ASE
Calculator with unit mapping and result caching, :163-339),
``SpkEnsembleCalculator`` with pluggable uncertainty estimators (:340-595),
and ``AseInterface`` (single points, optimization, MD, normal modes,
:596-839).

Everything here works on plain sample dicts (``{_atomic_numbers,
_positions, _cell, _pbc}``); when ``ase`` is importable, ``ase.Atoms``
objects are accepted transparently and ``SpkCalculator`` registers as a
genuine ``ase.calculators.calculator.Calculator`` subclass.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import properties as structure
from ..data.loader import PaddingSpec, collate, padding_for, round_up
from ..transform.neighborlist import NeighborListTransform
from ..units import convert_units

# ASE calculator protocol base.  When ase is importable, SpkCalculator is a
# genuine ``ase.calculators.calculator.Calculator`` subclass (parity:
# reference ase_interface.py:163); otherwise a faithful shim implements the
# same protocol (results dict, check_state/calculation_required/get_property)
# so downstream drivers written against the ASE surface keep working.
try:  # pragma: no cover - exercised only when ase is installed
    from ase.calculators.calculator import Calculator as CalculatorBase
    from ase.calculators.calculator import all_changes

    HAS_ASE = True
except ImportError:
    HAS_ASE = False
    all_changes = [
        "positions", "numbers", "cell", "pbc",
        "initial_charges", "initial_magmoms", "charges", "magmoms",
    ]

    def _copy_structure(atoms):
        if isinstance(atoms, dict):
            return {k: np.copy(v) if isinstance(v, np.ndarray) else v
                    for k, v in atoms.items()}
        return atoms.copy()

    def _structure_field(atoms, name):
        if isinstance(atoms, dict):
            keymap = {
                "positions": structure.R, "numbers": structure.Z,
                "cell": structure.cell, "pbc": structure.pbc,
            }
            return np.asarray(atoms.get(keymap[name], 0.0))
        getter = {
            "positions": "get_positions", "numbers": "get_atomic_numbers",
            "cell": "get_cell", "pbc": "get_pbc",
        }[name]
        return np.asarray(getattr(atoms, getter)())

    class CalculatorBase:
        """Stand-in for ``ase.calculators.calculator.Calculator`` matching
        its public protocol (the part SchNetPack's reference relies on:
        ``results``, ``atoms`` snapshot, ``check_state``,
        ``calculation_required``, ``get_property``)."""

        implemented_properties: List[str] = []

        def __init__(self, restart=None, label=None, atoms=None, **kwargs):
            self.results: Dict[str, np.ndarray] = {}
            self.atoms = None
            self.parameters = dict(kwargs)
            if atoms is not None:
                self.atoms = _copy_structure(atoms)
                try:
                    atoms.calc = self
                except (AttributeError, TypeError):
                    pass

        def reset(self):
            self.results = {}

        def calculate(self, atoms=None, properties=("energy",),
                      system_changes=all_changes):
            if atoms is not None:
                self.atoms = _copy_structure(atoms)

        def check_state(self, atoms, tol: float = 1e-15) -> List[str]:
            if self.atoms is None:
                return list(all_changes)
            changes = []
            for name in ("positions", "numbers", "cell", "pbc"):
                a = _structure_field(self.atoms, name)
                b = _structure_field(atoms, name)
                if a.shape != b.shape or not np.allclose(
                    a.astype(np.float64), b.astype(np.float64), atol=tol
                ):
                    changes.append(name)
            return changes

        def calculation_required(self, atoms, properties) -> bool:
            if self.check_state(atoms):
                return True
            return any(p not in self.results for p in properties)

        def get_property(self, name, atoms=None, allow_calculation=True):
            if atoms is None:
                atoms = self.atoms
            if self.calculation_required(atoms, [name]):
                if not allow_calculation:
                    return None
                self.calculate(atoms, [name], self.check_state(atoms))
            if name not in self.results:
                raise KeyError(
                    f"{name!r} not present in this calculation"
                )
            result = self.results[name]
            if isinstance(result, np.ndarray):
                result = result.copy()
            return result

        def get_potential_energy(self, atoms=None, **kwargs):
            return self.get_property("energy", atoms)

        def get_forces(self, atoms=None, **kwargs):
            return self.get_property("forces", atoms)

        def get_stress(self, atoms=None, **kwargs):
            return self.get_property("stress", atoms)


def _to_sample(atoms) -> Dict[str, np.ndarray]:
    """Accept ase.Atoms or a sample dict."""
    if isinstance(atoms, dict):
        return dict(atoms)
    # duck-typed ase.Atoms
    return {
        structure.Z: np.asarray(atoms.get_atomic_numbers(), np.int64),
        structure.R: np.asarray(atoms.get_positions(), np.float64),
        structure.cell: np.asarray(atoms.get_cell()),
        structure.pbc: np.asarray(atoms.get_pbc(), bool),
    }


class AtomsConverter:
    """Structures -> padded batched model inputs (parity: :55-158).

    Padding is bucketed (rounded up) so repeated calls with similar sizes
    reuse the jit cache instead of recompiling.
    """

    def __init__(
        self,
        neighbor_list: Optional[NeighborListTransform] = None,
        cutoff: Optional[float] = None,
        transforms: Sequence = (),
        dtype=np.float32,
        atom_bucket: int = 16,
        pair_bucket: int = 256,
    ):
        if neighbor_list is None:
            if cutoff is None:
                raise ValueError("need neighbor_list or cutoff")
            neighbor_list = NeighborListTransform(cutoff)
        self.neighbor_list = neighbor_list
        self.transforms = list(transforms)
        self.dtype = dtype
        self.atom_bucket = atom_bucket
        self.pair_bucket = pair_bucket

    def __call__(self, atoms) -> Dict[str, jax.Array]:
        if not isinstance(atoms, (list, tuple)):
            atoms = [atoms]
        samples = []
        for a in atoms:
            s = self.neighbor_list(_to_sample(a))
            for t in self.transforms:
                s = t(s)
            samples.append(s)
        spec = padding_for(
            samples, atom_multiple=self.atom_bucket, pair_multiple=self.pair_bucket
        )
        batch = collate(samples, spec, float_dtype=self.dtype)
        return {k: jnp.asarray(v) for k, v in batch.items()}


class AbsoluteUncertainty:
    """std across ensemble members (parity: :340-420)."""

    def __call__(self, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
        return std


class RelativeUncertainty:
    def __call__(self, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
        return std / (np.abs(mean) + 1e-12)


class SpkCalculator(CalculatorBase):
    """Model calculator over single structures — a genuine ASE
    ``Calculator`` subclass when ase is importable (parity: reference
    ase_interface.py:163-339), so ASE optimizers/constraints/filters see
    the standard ``results`` protocol; otherwise the shim base provides
    the same surface for dict structures.

    ``energy_unit``/``position_unit`` describe the model's units; results
    are converted to ASE's eV/Ang frame.
    """

    implemented_properties = ["energy", "forces", "stress"]

    def __init__(
        self,
        model,
        params,
        neighbor_list: Optional[NeighborListTransform] = None,
        cutoff: Optional[float] = None,
        energy_key: str = structure.energy,
        force_key: str = structure.forces,
        stress_key: Optional[str] = structure.stress,
        energy_unit: str = "eV",
        position_unit: str = "Ang",
        dtype=np.float32,
        transforms: Sequence = (),
        **kwargs,
    ):
        CalculatorBase.__init__(self, **kwargs)
        self.model = model
        self.params = params
        self.converter = AtomsConverter(
            neighbor_list=neighbor_list, cutoff=cutoff, transforms=transforms, dtype=dtype
        )
        self.energy_key = energy_key
        self.force_key = force_key
        self.stress_key = stress_key
        self.energy_conversion = convert_units(energy_unit, "eV")
        self.position_conversion = convert_units(position_unit, "Ang")
        self._last_sample_fingerprint = None
        self._apply = jax.jit(lambda p, b: model.apply(p, b))

    def _fingerprint(self, sample: Dict[str, np.ndarray]):
        return (
            sample[structure.R].tobytes(),
            sample[structure.Z].tobytes(),
            np.asarray(sample.get(structure.cell, 0)).tobytes(),
        )

    def calculate(
        self,
        atoms=None,
        properties: Sequence[str] = ("energy",),
        system_changes: Sequence[str] = all_changes,
    ) -> Dict[str, np.ndarray]:
        """ASE-protocol calculate: stores standard keys in ``self.results``
        (all model properties are computed regardless of ``properties``,
        like the reference :276-287).  Also returns the results dict for
        the framework's own drivers."""
        if atoms is None:
            atoms = self.atoms
        sample = _to_sample(atoms)
        fp = self._fingerprint(sample)
        if fp == self._last_sample_fingerprint and self.results:
            return self.results
        CalculatorBase.calculate(self, atoms)
        n = len(sample[structure.Z])
        batch = self.converter(sample)
        out = self._apply(self.params, batch)

        results = {}
        e_conv = self.energy_conversion
        f_conv = e_conv / self.position_conversion
        if self.energy_key in out:
            results["energy"] = float(out[self.energy_key][0]) * e_conv
        if self.force_key in out:
            results["forces"] = np.asarray(out[self.force_key][:n]) * f_conv
        if self.stress_key and self.stress_key in out:
            results["stress"] = (
                np.asarray(out[self.stress_key][0]) * e_conv / self.position_conversion**3
            )
        for extra in (structure.dipole_moment, structure.partial_charges,
                      structure.polarizability):
            if extra in out and extra in getattr(self.model, "model_outputs", []):
                v = np.asarray(out[extra])
                results[extra] = v[:n] if v.shape[:1] == batch[structure.Z].shape[:1] else v[0]
        self.results = results
        self._last_sample_fingerprint = fp
        return results

    # ASE Calculator duck-type surface ----------------------------------
    def get_potential_energy(self, atoms=None, **kwargs) -> float:
        return self.calculate(atoms)["energy"]

    def get_forces(self, atoms=None, **kwargs) -> np.ndarray:
        return self.calculate(atoms)["forces"]

    def get_stress(self, atoms=None, **kwargs) -> np.ndarray:
        return self.calculate(atoms)["stress"]


class SpkEnsembleCalculator(SpkCalculator):
    """Ensemble mean + uncertainty (parity: :340-595).

    ``params_list``: list of parameter pytrees; evaluation is one vmap over
    stacked parameters (single compiled program for the whole ensemble).
    """

    def __init__(self, model, params_list: List, uncertainty=None, **kwargs):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        super().__init__(model, stacked, **kwargs)
        self.uncertainty_fns = (
            uncertainty if isinstance(uncertainty, (list, tuple))
            else [uncertainty or AbsoluteUncertainty()]
        )
        self._apply = jax.jit(
            lambda p, b: jax.vmap(lambda q: model.apply(q, b))(p)
        )

    def calculate(
        self,
        atoms=None,
        properties: Sequence[str] = ("energy",),
        system_changes: Sequence[str] = all_changes,
    ) -> Dict[str, np.ndarray]:
        if atoms is None:
            atoms = self.atoms
        sample = _to_sample(atoms)
        CalculatorBase.calculate(self, atoms)
        n = len(sample[structure.Z])
        batch = self.converter(sample)
        out = self._apply(self.params, batch)  # leaves [E, ...]
        results = {}
        e_conv = self.energy_conversion
        f_conv = e_conv / self.position_conversion
        for key, name, conv, idx in (
            (self.energy_key, "energy", e_conv, (slice(None), 0)),
            (self.force_key, "forces", f_conv, (slice(None), slice(0, n))),
        ):
            if key in out:
                v = np.asarray(out[key][idx]) * conv
                mean, std = v.mean(axis=0), v.std(axis=0)
                results[name] = mean if name != "energy" else float(mean)
                for ufn in self.uncertainty_fns:
                    results[f"{name}_uncertainty"] = ufn(mean, std)
        self.results = results
        return results


class AseInterface:
    """High-level driver: single points, optimization, MD, normal modes
    (parity: :596-839) — backed by this framework's own MD engine and
    batchwise optimizer, or by ase when available."""

    def __init__(self, atoms, calculator: SpkCalculator, working_dir: str = "."):
        self.atoms = _to_sample(atoms)
        self.calculator = calculator
        self.working_dir = working_dir

    def calculate_single_point(self) -> Dict[str, np.ndarray]:
        return self.calculator.calculate(self.atoms)

    def optimize(self, fmax: float = 1e-2, steps: int = 200,
                 name: str = "optimization"):
        """Relax the structure; writes resumable on-disk artifacts into
        ``working_dir`` (parity: reference ase_interface.py:759-800 —
        ASE optimizer trajectory + logfile): ``<name>.extxyz`` holds every
        iteration with energy+forces, ``<name>.log`` the optimizer lines,
        and ``<name>_final.extxyz`` the relaxed geometry."""
        import os

        from ..datasets.xyz import write_extxyz
        from .batchwise import BatchwiseCalculator, batchwise_lbfgs

        bc = BatchwiseCalculator(
            self.calculator.model, self.calculator.params,
            converter=self.calculator.converter,
        )
        os.makedirs(self.working_dir, exist_ok=True)
        traj = os.path.join(self.working_dir, f"{name}.extxyz")
        log = os.path.join(self.working_dir, f"{name}.log")
        relaxed, info = batchwise_lbfgs(
            bc, [self.atoms], fmax=fmax, maxstep_total=steps,
            trajectory=traj, logfile=log,
        )
        self.atoms = relaxed[0]
        res = self.calculator.calculate(self.atoms)
        cell = np.asarray(self.atoms.get(structure.cell, np.zeros((3, 3))))
        write_extxyz(
            os.path.join(self.working_dir, f"{name}_final.extxyz"),
            [{
                "numbers": np.asarray(self.atoms[structure.Z]),
                "positions": np.asarray(self.atoms[structure.R]),
                "cell": cell if np.any(cell) else None,
                "energy": float(np.asarray(res["energy"]).ravel()[0]),
                "forces": np.asarray(res["forces"]),
            }],
        )
        return info

    def run_md(self, n_steps: int, temperature: float = 300.0, time_step: float = 0.5,
               thermostat_time: float = 100.0):
        import jax as _jax

        from ..md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
        from ..md.calculators import SchNetPackCalculator
        from ..md.simulation_hooks import LangevinThermostat

        system = load_molecules([self.atoms])
        system = MaxwellBoltzmannInit(temperature).initialize_system(
            system, _jax.random.PRNGKey(0)
        )
        calc = SchNetPackCalculator(
            self.calculator.model, self.calculator.params,
            cutoff=self.calculator.converter.neighbor_list.cutoff,
        )
        sim = Simulator(
            system, VelocityVerlet(time_step), calc,
            simulator_hooks=[LangevinThermostat(temperature, thermostat_time)],
            progress=False,
        )
        sim.simulate(n_steps)
        pos = np.asarray(sim.state.system.positions[0])
        from ..units import md_units

        self.atoms[structure.R] = pos / md_units().length
        return sim

    def compute_normal_modes(self, delta: float = 0.01):
        """Finite-difference Hessian -> harmonic frequencies (cm^-1)."""
        from ..transform.atomistic import ATOMIC_MASSES
        from ..units import invcm

        R0 = np.asarray(self.atoms[structure.R], np.float64)
        n = len(R0)
        H = np.zeros((3 * n, 3 * n))
        for a in range(n):
            for d in range(3):
                Rp, Rm = R0.copy(), R0.copy()
                Rp[a, d] += delta
                Rm[a, d] -= delta
                fp = self.calculator.calculate({**self.atoms, structure.R: Rp})["forces"]
                fm = self.calculator.calculate({**self.atoms, structure.R: Rm})["forces"]
                H[3 * a + d] = -(fp - fm).reshape(-1) / (2 * delta)
        H = 0.5 * (H + H.T)
        m = ATOMIC_MASSES[np.asarray(self.atoms[structure.Z])]
        minv = 1.0 / np.sqrt(np.repeat(m, 3))
        Hw = H * minv[:, None] * minv[None, :]
        w2 = np.linalg.eigvalsh(Hw)
        # omega in ASE units -> cm^-1
        from ..units import hbar

        freqs = np.sign(w2) * np.sqrt(np.abs(w2)) * hbar / invcm
        return freqs
