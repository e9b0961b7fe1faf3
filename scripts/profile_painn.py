"""Decompose the PaiNN force-eval cost on the 10,976-atom bench system.

Measures (honest host-fenced timing, chained scan):
  - forward-only vs forward+forces at K in {12, 20}
  - marginal cost per interaction layer
  - FLOPs from compiled.cost_analysis() -> MFU
"""
from __future__ import annotations

import time

import numpy as np


def fcc_box(n_target: int, a: float = 5.26):
    n_cells = int(round((n_target / 4) ** (1 / 3)))
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                pos.append((base + [i, j, k]) * a)
    return np.concatenate(pos), np.eye(3) * (a * n_cells)


def main():
    import jax
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate, padding_for, round_up
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 5.0
    pos, cell = fcc_box(10_000)
    n_atoms = len(pos)
    mol = {
        P.Z: np.full(n_atoms, 18, dtype=np.int64),
        P.R: pos,
        P.cell: cell,
        P.pbc: np.ones(3, bool),
    }

    def build_batch(k_slots, rbuild):
        sample = NeighborListTransform(rbuild)(dict(mol))
        base = padding_for([sample])
        spec = PaddingSpec(base.n_atoms, base.n_pairs, base.n_molecules,
                           n_neighbors=k_slots)
        return {k: jnp.asarray(v) for k, v in collate([sample], spec).items()}

    results = {}

    def timed(name, fn, x0, n_iter=16, n_rep=3):
        import jax.numpy as jnp
        run = jax.jit(fn)
        float(jnp.sum(run(x0 + 1e-5)))
        ts = []
        for r in range(n_rep):
            xr = x0 + 1e-7 * r
            float(jnp.sum(xr))
            t0 = time.perf_counter()
            float(jnp.sum(run(xr)))
            ts.append((time.perf_counter() - t0) / n_iter * 1e3)
        ms = float(np.median(ts))
        results[name] = round(ms, 2)
        print(f"{name:42s} {ms:8.2f} ms  {ts}", flush=True)
        return run

    for k_slots, rbuild, tag in [(12, 5.0, "K12"), (20, 5.3, "K20")]:
        batch = build_batch(k_slots, rbuild)
        for n_int in ([3] if tag == "K20" else [1, 3]):
            pot_f = NeuralNetworkPotential(
                representation=PaiNN(n_atom_basis=128, n_interactions=n_int,
                                     n_rbf=20, cutoff=cutoff),
                input_modules=[PairwiseDistances()],
                output_modules=[Atomwise(output_key=P.energy), Forces()],
            )
            pot_e = NeuralNetworkPotential(
                representation=PaiNN(n_atom_basis=128, n_interactions=n_int,
                                     n_rbf=20, cutoff=cutoff),
                input_modules=[PairwiseDistances()],
                output_modules=[Atomwise(output_key=P.energy)],
            )
            params = pot_f.init(jax.random.PRNGKey(0), batch)

            def fwd_forces(R, batch=batch, params=params, pot=pot_f):
                def body(r, _):
                    b = dict(batch)
                    b[P.R] = r
                    return r + 1e-7 * pot.apply(params, b)[P.forces], None
                return jax.lax.scan(body, R, None, length=16)[0]

            def fwd_only(R, batch=batch, params=params, pot=pot_e):
                def body(r, _):
                    b = dict(batch)
                    b[P.R] = r
                    e = pot.apply(params, b)[P.energy]
                    return r + 1e-12 * e[0], None
                return jax.lax.scan(body, R, None, length=16)[0]

            timed(f"{tag}_L{n_int}_fwd_only", fwd_only, batch[P.R])
            run = timed(f"{tag}_L{n_int}_fwd_forces", fwd_forces, batch[P.R])

            if tag == "K20" and n_int == 3:
                lowered = jax.jit(run.__wrapped__).lower(batch[P.R])
                comp = lowered.compile()
                ca = comp.cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                flops = ca.get("flops", 0.0) / 16
                ms = results[f"{tag}_L{n_int}_fwd_forces"]
                print(f"FLOPs/step={flops:.3e}  MFU(bf16 peak 197T)="
                      f"{flops/(ms*1e-3)/197e12*100:.2f}%  "
                      f"MFU(f32 peak ~49T)={flops/(ms*1e-3)/49e12*100:.2f}%",
                      flush=True)

    print(results)


if __name__ == "__main__":
    main()
