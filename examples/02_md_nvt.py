"""NVT molecular dynamics with a trained potential (library API).

Equivalent CLI: python -m schnetpack_tpu.md.cli system.molecule_file=... \
    calculator.model_dir=... dynamics=nvt
"""
import jax

from schnetpack_tpu.md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
from schnetpack_tpu.md.calculators import SchNetPackCalculator
from schnetpack_tpu.md.cli import load_structures
from schnetpack_tpu.md.simulation_hooks import Checkpoint, FileLogger, NHCThermostat
from schnetpack_tpu.utils import load_model


def main(structure_file: str, model_dir: str, n_steps: int = 100_000,
         temperature: float = 300.0):
    model, params = load_model(model_dir)
    molecules = load_structures(structure_file)

    system = load_molecules(molecules)
    system = MaxwellBoltzmannInit(temperature, remove_rotation=True).initialize_system(
        system, jax.random.PRNGKey(0)
    )

    calc = SchNetPackCalculator(
        model, params, cutoff=5.0, cutoff_shell=0.5,
        neighbor_list="dense",  # scatter-free TPU-fast path with skin rebuilds
    )
    sim = Simulator(
        system,
        VelocityVerlet(0.5),  # fs
        calc,
        simulator_hooks=[
            NHCThermostat(temperature, time_constant=100.0),
            FileLogger("simulation.hdf5"),
            Checkpoint("checkpoint.pkl", every_n_steps=1000),
        ],
    )
    sim.simulate(n_steps, chunk_size=100)


if __name__ == "__main__":
    import sys

    main(*sys.argv[1:3])
