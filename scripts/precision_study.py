"""Precision policy study (SURVEY hard part 4 / VERDICT round-2 #8).

The reference runs MD in float64 on GPU (schnetpack_calculator.py:96-99);
TPUs are f32/bf16-native (no hardware f64).  This study measures, on the
real TPU, what the feature-precision modes of the blocked kernels cost in
accuracy:

1. force error vs the exact-f32 path (PIECES=3) on the 10,976-atom bench
   system, for PIECES in {1, 2};
2. NVE total-energy drift over a long chunked run for each mode
   (2,048-atom argon box, PaiNN-128x3, 0.5 fs).

Positions/geometry are always exact f32 (the fused geometry kernel uses
3x-bf16 split selection regardless of the feature mode).

Writes its table to stdout; PERF.md records the results.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import fcc_box  # noqa: E402


def build(n_atoms, precision, temp=30.0, jitter=0.0):
    import jax

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import (
        MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
    )
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 5.0
    pos, cell = fcc_box(n_atoms)
    if jitter:
        # a perfect lattice has F = 0 by symmetry — force-error ratios on
        # it are noise/noise; jitter puts the geometry on a thermal-like
        # manifold with O(1) forces
        pos = pos + np.random.RandomState(7).normal(0.0, jitter, pos.shape)
    n = len(pos)
    mol = {P.Z: np.full(n, 18, dtype=np.int64), P.R: pos, P.cell: cell,
           P.pbc: np.ones(3, bool)}
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(cutoff)(
        {P.Z: mol[P.Z][:32], P.R: mol[P.R][:32], P.cell: np.zeros((3, 3)),
         P.pbc: np.zeros(3, bool)})
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(48, 1024, 2)))
    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(temp).initialize_system(
        system, jax.random.PRNGKey(1))
    calc = SchNetPackCalculator(pot, params, cutoff=cutoff, cutoff_shell=0.6,
                                neighbor_list="cellblock",
                                precision=precision)
    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False,
                    log_keys=("energy", "kinetic_energy", "temperature"))
    return sim, calc, system


def force_error():
    import jax

    results = {}
    f_ref = None
    for precision in ("f32", "mixed", "bf16"):
        sim, calc, system = build(10_000, precision, jitter=0.15)
        st = calc.init_state(system)
        out = calc.calculate(system, st)
        f = np.asarray(jax.device_get(out.forces))[0]
        if precision == "f32":
            f_ref = f
            scale = np.abs(f_ref).max()
            results[precision] = (0.0, 0.0)
        else:
            err = np.abs(f - f_ref)
            results[precision] = (float(err.max() / scale),
                                  float(np.sqrt((err ** 2).mean())
                                        / np.sqrt((f_ref ** 2).mean())))
        print(f"force err vs f32  {precision:6s}  max(rel)="
              f"{results[precision][0]:.2e}  rms(rel)="
              f"{results[precision][1]:.2e}", flush=True)
    return results


def nve_drift_series(n_steps=3000, n_atoms=2000):
    """Total-energy series via the chunk logs; returns drift per atom/ps."""
    rows = {}
    for precision in ("f32", "mixed", "bf16"):
        sim, calc, system = build(n_atoms, precision)

        class Grab:
            def __init__(self):
                self.e = []

            def on_simulation_start(self, sim):
                pass

            def on_simulation_end(self, sim):
                pass

            def process_chunk(self, sim, logs, start):
                etot = logs["energy"].sum(axis=(1, 2)) + logs[
                    "kinetic_energy"].sum(axis=(1, 2))
                self.e.append(etot)

        g = Grab()
        sim.host_hooks.append(g)
        t0 = time.time()
        sim.simulate(n_steps, chunk_size=300)
        wall = time.time() - t0
        e = np.concatenate(g.e)
        t_ps = np.arange(len(e)) * 0.5e-3
        slope = np.polyfit(t_ps, e, 1)[0]          # MD-energy / ps
        rows[precision] = {
            "drift_per_atom_ps": float(slope / sim.system.total_atoms),
            "sigmaE_per_atom": float(e.std() / sim.system.total_atoms),
            "wall_s": round(wall, 1),
            "steps_per_s": round(n_steps / wall, 1),
        }
        print(precision, rows[precision], flush=True)
    return rows


if __name__ == "__main__":
    print("== force error (10,976 atoms, single eval) ==", flush=True)
    force_error()
    print("== NVE drift (2,048 atoms, 0.5 fs, 3000 steps) ==", flush=True)
    nve_drift_series()
