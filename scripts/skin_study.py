"""Measure steady-state MD chunk time vs neighbor-skin on the bench system.

The FCC-argon bench has its second coordination shell at 5.26 A — just
outside the 5.0 A physics cutoff.  A build radius below 5.26 A (skin
< 0.26) drops those 6 edges/atom (18 -> 12, -33% edge slots in every
message kernel); thermal motion pulls some of them back in at rebuild
time, so the honest comparison is the *thermalized* steady state,
including rebuild cost and any capacity-growth recompiles.

Usage: python scripts/skin_study.py [skin] [jitter_fraction] [chunks]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import fcc_box  # noqa: E402


def main(skin=0.25, jf=1.0, n_chunks=8):
    import jax

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import (
        MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
    )
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.md.neighborlist_md import CellBlockNeighborListMD
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform
    from schnetpack_tpu.units import _parse_unit, md_units

    cutoff = 5.0
    pos, cell = fcc_box(10_000)
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

    conv = _parse_unit("Ang") * md_units().length
    nbl = CellBlockNeighborListMD(cutoff * conv, skin=skin * conv,
                                  layout="column", jitter_fraction=jf,
                                  bucket_headroom=1.0 / 12.0)
    calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                cutoff_shell=skin, neighbor_list=nbl,
                                precision="bf16")
    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False)

    dims0 = None
    chunk = 300
    t0 = time.time()
    sim.simulate(chunk, chunk_size=chunk)  # compile + thermalize 0.15 ps
    print(f"skin={skin} jf={jf}: warmup+compile {time.time()-t0:.1f}s "
          f"dims={nbl._dims} P={nbl._C} Ktot={sum(nbl._K)}", flush=True)
    dims0 = (nbl._C, nbl._K)
    calc.dense_nbl._rebuild_on_device(sim.state.system)
    rebuilds0 = getattr(nbl, "rebuild_count", None)
    dts = []
    for c in range(int(n_chunks)):
        t0 = time.time()
        sim.simulate(chunk, chunk_size=chunk)
        dt = (time.time() - t0) / chunk * 1e3
        dts.append(dt)
        grew = "" if (nbl._C, nbl._K) == dims0 else f" GREW -> Ktot={sum(nbl._K)}"
        print(f"  chunk {c}: {dt:.2f} ms/step{grew}", flush=True)
        dims0 = (nbl._C, nbl._K)
    dts.sort()
    print(f"skin={skin}: min {dts[0]:.2f} median {dts[len(dts)//2]:.2f} "
          f"ms/step -> {n/dts[0]*1e3:.0f} atom-steps/s", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(float(x) for x in a[:2]), *(int(x) for x in a[2:3]))
