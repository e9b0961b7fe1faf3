"""spkmd — config-driven MD simulation CLI.

Parity: ``src/schnetpack/md/cli.py:35-353`` — builds a System from a
structure file, wires the calculator (trained model or LJ), thermostat /
barostat / integrator (with NPT substitution when a barostat is present,
parity md/utils/md_config.py:211-230 and RPMD detection :190-209), logging
and checkpoint hooks, then runs the scan-compiled simulator.

Usage:
    python -m schnetpack_tpu.md.cli system.molecule_file=water.xyz \\
        calculator.model_dir=<run dir> dynamics=nvt dynamics.n_steps=1000
"""
from __future__ import annotations

import os
import pickle
import sys
from typing import Dict, List, Optional

import numpy as np

from ..config.compose import Composer, instantiate, save_config

_MD_CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "md_configs")


def load_structures(path: str):
    """Read initial structures from (ext)xyz; ase formats when available."""
    from .. import properties as structure
    from ..datasets.xyz import read_extxyz_file

    if path.endswith((".xyz", ".extxyz")):
        blocks = read_extxyz_file(path)
        out = []
        for b in blocks:
            out.append(
                {
                    structure.Z: b["numbers"],
                    structure.R: b["positions"],
                    structure.cell: b.get("cell", np.zeros((3, 3))),
                    structure.pbc: np.array([("cell" in b)] * 3),
                }
            )
        return out
    try:
        import ase.io

        atoms_list = ase.io.read(path, index=":")
        return [
            {
                structure.Z: a.get_atomic_numbers(),
                structure.R: a.get_positions(),
                structure.cell: np.asarray(a.get_cell()),
                structure.pbc: a.get_pbc(),
            }
            for a in atoms_list
        ]
    except ImportError as e:
        raise ValueError(f"cannot read structure file {path!r} without ase") from e


def build_calculator(cfg: Dict):
    cfg = dict(cfg)
    target = cfg.get("_target_", "")
    if target.endswith("EnsembleCalculator"):
        # calculator=ensemble calculator.model_dirs='[run1,run2,...]'
        from ..cli import load_model
        from .calculators import EnsembleCalculator, stack_ensemble_params

        model_dirs = cfg.pop("model_dirs")
        if isinstance(model_dirs, str):
            model_dirs = [d for d in model_dirs.strip("[]").split(",") if d]
        loaded = [load_model(d) for d in model_dirs]
        model = loaded[0][0]
        stacked = stack_ensemble_params([p for _, p in loaded])
        cfg.pop("_target_", None)
        return EnsembleCalculator(model, stacked, **cfg)
    if target.endswith("SchNetPackCalculator"):
        from ..cli import load_model

        model_dir = cfg.pop("model_dir")
        model, params = load_model(model_dir)
        cfg.pop("_target_", None)
        from .calculators import SchNetPackCalculator

        return SchNetPackCalculator(model, params, **cfg)
    return instantiate(cfg)


def simulate(config: Dict):
    import jax

    from . import Simulator, load_molecules
    from .simulation_hooks import Checkpoint, FileLogger, TensorBoardLoggerMD

    sim_dir = config["simulation_dir"]
    os.makedirs(sim_dir, exist_ok=config.get("overwrite", False) or True)
    save_config(config, os.path.join(sim_dir, "config.yaml"))

    sys_cfg = config["system"]
    molecules = load_structures(sys_cfg["molecule_file"])
    dyn = config["dynamics"]
    integrator = instantiate(dyn["integrator"])
    n_replicas = int(sys_cfg.get("n_replicas", 1))
    if getattr(integrator, "ring_polymer", False):
        n_replicas = integrator.n_beads

    system = load_molecules(
        molecules,
        n_replicas=n_replicas,
        position_unit_input=sys_cfg.get("position_unit_input", "Ang"),
    )
    # top-level config groups (spkmd thermostat=piglet barostat=nhc_iso
    # initializer=uniform ...) override the dynamics/system presets
    if config.get("thermostat"):
        dyn = dict(dyn)
        dyn["thermostat"] = config["thermostat"]
    if config.get("barostat"):
        dyn = dict(dyn)
        dyn["barostat"] = config["barostat"]
    if config.get("initializer"):
        sys_cfg = dict(sys_cfg)
        sys_cfg["initializer"] = config["initializer"]
    if sys_cfg.get("initializer"):
        init = instantiate(sys_cfg["initializer"])
        system = init.initialize_system(
            system, jax.random.PRNGKey(int(config.get("seed", 42)))
        )

    calculator = build_calculator(config["calculator"])

    hooks: List = []
    if dyn.get("thermostat"):
        hooks.append(instantiate(dyn["thermostat"]))
    barostat = None
    if dyn.get("barostat"):
        barostat = instantiate(dyn["barostat"])
        hooks.append(barostat)
        # NPT integrator substitution (parity: md_config.py:211-230)
        from .integrators import (
            NPTRingPolymer,
            NPTVelocityVerlet,
            RingPolymer,
            VelocityVerlet,
        )

        if isinstance(integrator, RingPolymer) and not integrator.pressure_control:
            integrator = NPTRingPolymer(
                dyn["integrator"]["time_step"], integrator.n_beads,
                integrator.temperature, barostat,
            )
        elif isinstance(integrator, VelocityVerlet) and not integrator.pressure_control:
            integrator = NPTVelocityVerlet(dyn["integrator"]["time_step"], barostat)

    cb = config.get("callbacks", {}) or {}
    if cb.get("file_logger"):
        hooks.append(
            FileLogger(
                os.path.join(sim_dir, "simulation.hdf5"),
                every_n_steps=int(cb["file_logger"].get("every_n_steps", 1)),
                restart=bool(config.get("restart")),
            )
        )
    if cb.get("checkpoint"):
        hooks.append(
            Checkpoint(
                os.path.join(sim_dir, "checkpoint.pkl"),
                every_n_steps=int(cb["checkpoint"].get("every_n_steps", 1000)),
            )
        )
    if cb.get("tensorboard"):
        hooks.append(TensorBoardLoggerMD(os.path.join(sim_dir, "tb")))

    simulator = Simulator(
        system, integrator, calculator, simulator_hooks=hooks,
        seed=int(config.get("seed", 42)),
    )

    restart = config.get("restart")
    if restart:
        with open(restart, "rb") as f:
            simulator.restart_simulation(pickle.load(f))

    simulator.simulate(int(dyn["n_steps"]), chunk_size=int(dyn.get("chunk_size", 100)))
    return simulator


def main(argv: Optional[List[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    composer = Composer([os.getcwd(), _MD_CONFIG_DIR])
    config = composer.compose("config", argv)
    simulate(config)


if __name__ == "__main__":
    main()
