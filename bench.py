"""Benchmark: PaiNN energy+forces evaluation throughput at 10k atoms.

This is the MD inner-loop compute (BASELINE.json metric: "MD atom-steps/sec
per chip at 10k atoms").  A 10,976-atom periodic FCC argon box with a 5 A
cutoff is evaluated with the flagship PaiNN model (128 features, 3
interactions) using the dense neighbor-matrix layout (scatter-free
aggregation — the TPU-fast path).

Timing methodology: N sequential force evaluations chained inside ONE
``lax.scan`` dispatch (each step's positions depend on the previous step's
forces), exactly like the MD engine runs.  This defeats both dispatch
pipelining and the remote-execution result cache, giving honest
steady-state per-step numbers.

``vs_baseline`` is measured against the north-star target of 5e6
atom-steps/s (5x an assumed 1e6 atom-steps/s for PaiNN/10k-atoms on A100,
cf. BASELINE.md).
"""
import json
import time

import numpy as np

BASELINE_ATOM_STEPS = 5.0e6


def fcc_box(n_target: int, a: float = 5.26):
    """FCC argon supercell with ~n_target atoms."""
    n_cells = int(round((n_target / 4) ** (1 / 3)))
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                pos.append((base + [i, j, k]) * a)
    pos = np.concatenate(pos)
    cell = np.eye(3) * (a * n_cells)
    return pos, cell


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
    sample = {
        P.Z: np.full(n_atoms, 18, dtype=np.int64),
        P.R: pos,
        P.cell: cell,
        P.pbc: np.ones(3, bool),
    }
    t_nbl = time.time()
    sample = NeighborListTransform(cutoff)(sample)
    nbl_time = time.time() - t_nbl
    base = padding_for([sample])
    max_nbrs = int(np.bincount(sample[P.idx_i]).max())
    spec = PaddingSpec(
        base.n_atoms, base.n_pairs, base.n_molecules,
        n_neighbors=round_up(max_nbrs, 4),
    )
    batch = collate([sample], spec)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20, cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    params = pot.init(jax.random.PRNGKey(0), batch)

    n_iter = 30

    def chained(R0):
        def body(R, _):
            b = dict(batch)
            b[P.R] = R
            F = pot.apply(params, b)[P.forces]
            return R + 1e-7 * F, None  # sequential dependency, tiny drift

        R, _ = jax.lax.scan(body, R0, None, length=n_iter)
        return R

    run = jax.jit(chained)
    # compile + warmup with different data than the timed run
    jax.block_until_ready(run(batch[P.R] + 1e-5))
    R_in = batch[P.R]
    t0 = time.time()
    out = run(R_in)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_iter

    atom_steps = n_atoms / dt
    print(
        json.dumps(
            {
                "metric": "painn_force_eval_atom_steps_per_sec_10k_atoms",
                "value": round(atom_steps, 1),
                "unit": "atom-steps/s",
                "vs_baseline": round(atom_steps / BASELINE_ATOM_STEPS, 4),
                "detail": {
                    "n_atoms": int(n_atoms),
                    "n_pairs": int(np.asarray(batch[P.pair_mask]).sum()),
                    "ms_per_step": round(dt * 1e3, 3),
                    "host_nbl_s": round(nbl_time, 2),
                    "layout": "dense",
                    "timing": "chained-scan",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
