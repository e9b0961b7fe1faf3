"""16-bead ring-polymer (PIMD) simulation with PILE thermostatting,
followed by IR-spectrum analysis of the trajectory."""
import jax

from schnetpack_tpu.md import MaxwellBoltzmannInit, RingPolymer, Simulator, load_molecules
from schnetpack_tpu.md.calculators import SchNetPackCalculator
from schnetpack_tpu.md.cli import load_structures
from schnetpack_tpu.md.data import HDF5Loader, IRSpectrum, PowerSpectrum
from schnetpack_tpu.md.simulation_hooks import FileLogger, PILELocalThermostat
from schnetpack_tpu.utils import load_model

N_BEADS = 16
T = 300.0


def main(structure_file: str, model_dir: str, n_steps: int = 50_000):
    model, params = load_model(model_dir)
    system = load_molecules(load_structures(structure_file), n_replicas=N_BEADS)
    system = MaxwellBoltzmannInit(T).initialize_system(system, jax.random.PRNGKey(0))

    sim = Simulator(
        system,
        RingPolymer(0.25, n_beads=N_BEADS, temperature=T),
        SchNetPackCalculator(model, params, cutoff=5.0),
        simulator_hooks=[
            PILELocalThermostat(T, time_constant=100.0),
            FileLogger("pimd.hdf5"),
        ],
    )
    sim.simulate(n_steps, chunk_size=100)

    # post-hoc: vibrational density of states from the centroid velocities
    data = HDF5Loader("pimd.hdf5", skip_initial=1000)
    spectrum = PowerSpectrum(data, resolution=4096)
    spectrum.compute_spectrum(0)
    (freq, intensity), = spectrum.get_spectrum()
    print("VDOS peak at", freq[intensity.argmax()], "cm^-1")


if __name__ == "__main__":
    import sys

    main(*sys.argv[1:3])
