"""Trace one MD chunk with jax.profiler and print top ops by device time.

Usage: python scripts/trace_md.py [dense|cellblock] [n_atoms] [steps]
Parses the trace_viewer json.gz directly (no tensorboard needed).
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")
from bench import fcc_box  # noqa: E402


def build_sim(mode, n_atoms):
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
    system = MaxwellBoltzmannInit(30.0).initialize_system(
        system, jax.random.PRNGKey(1))
    if mode == "cellblock":
        # production bench settings: column layout, tight capacity probe,
        # bf16 feature precision
        from schnetpack_tpu.md.neighborlist_md import CellBlockNeighborListMD
        from schnetpack_tpu.units import _parse_unit, md_units

        conv = _parse_unit("Ang") * md_units().length
        nbl = CellBlockNeighborListMD(cutoff * conv, skin=0.6 * conv,
                                      layout="column", jitter_fraction=0.25,
                                      bucket_headroom=1.0 / 12.0)
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.6, neighbor_list=nbl,
                                    precision="bf16")
    else:
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.3, neighbor_list=mode)
    return Simulator(system, VelocityVerlet(0.5), calc, progress=False)


def main(mode="cellblock", n_atoms=10_976, steps=10):
    import jax

    sim = build_sim(mode, n_atoms)
    sim.simulate(steps, chunk_size=steps)  # compile + warm
    if mode == "cellblock":
        # bench.py's post-equilibration capacity retighten
        nbl = sim.calculator.dense_nbl
        K0 = sum(nbl._K)
        nbl.retighten(sim.state.system, jitter_fraction=0.05,
                      bucket_headroom=1.0 / 24.0)
        print(f"retighten: Ktot {K0} -> {sum(nbl._K)}", file=sys.stderr)
        sim.simulate(steps, chunk_size=steps)  # recompile tightened shapes
    out = f"/tmp/trace_{mode}"
    with jax.profiler.trace(out):
        sim.simulate(steps, chunk_size=steps)

    files = sorted(glob.glob(out + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace file found under", out)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-side complete events only (pid of TPU device tracks)
    pids = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, name in pids.items()
                if "TPU" in name or "/device" in name.lower()}
    agg = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
    print(f"pids seen: {dict(list(pids.items())[:20])}", file=sys.stderr)
    print(f"total device time {total:.1f} ms over {steps} steps "
          f"({total/steps:.2f} ms/step)")
    top = sorted(agg.items(), key=lambda kv: -kv[1])
    shown = 0.0
    for name, ms in top[:60]:
        print(f"  {ms/steps:8.3f} ms/step  {name[:110]}")
    # everything outside the while body is double counted; report tail sum
    inner = [(n, m) for n, m in top if not n.startswith(("jit_", "while", "0"))]
    tail = sum(m for _, m in inner[60:])
    print(f"  tail ({max(0, len(inner)-60)} ops): {tail/steps:.3f} ms/step")
    print(f"  sum of inner ops: {sum(m for _, m in inner)/steps:.3f} ms/step")


if __name__ == "__main__":
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:]))
