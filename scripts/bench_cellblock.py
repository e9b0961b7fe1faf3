"""Quick dense vs cellblock force-eval + MD-loop timing at 10,976 atoms."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import fcc_box  # noqa: E402


def main(mode="cellblock", n_atoms=10_000, steps=30):
    import jax

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 5.0
    pos, cell = fcc_box(n_atoms)
    n = len(pos)
    mol = {
        P.Z: np.full(n, 18, dtype=np.int64),
        P.R: pos,
        P.cell: cell,
        P.pbc: np.ones(3, bool),
    }
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20, cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(cutoff)(
        {P.Z: mol[P.Z][:32], P.R: mol[P.R][:32], P.cell: np.zeros((3, 3)),
         P.pbc: np.zeros(3, bool)}
    )
    params = pot.init(jax.random.PRNGKey(0), collate([probe], PaddingSpec(48, 1024, 2)))

    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(30.0).initialize_system(system, jax.random.PRNGKey(1))
    calc = SchNetPackCalculator(
        pot, params, cutoff=cutoff, cutoff_shell=0.3, neighbor_list=mode,
    )
    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False,
                    log_keys=("energy", "temperature"))

    sim.simulate(steps, chunk_size=steps)  # warmup/compile
    t0 = time.time()
    sim.simulate(steps, chunk_size=steps)
    dt = (time.time() - t0) / steps
    if calc.dense_nbl is not None and hasattr(calc.dense_nbl, "_layout"):
        print("dims:", calc.dense_nbl._layout.dims, file=sys.stderr)
    print(json.dumps({
        "mode": mode, "n_atoms": n, "ms_per_step": round(dt * 1e3, 3),
        "atom_steps_per_sec": round(n / dt, 1),
    }))


if __name__ == "__main__":
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:]))
