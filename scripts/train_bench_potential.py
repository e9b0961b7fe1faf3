"""Train the benchmark potential: PaiNN-128x3 on Lennard-Jones argon.

The throughput benchmark (bench.py) must time a PHYSICALLY VALID
trajectory: a random-weight network either collapses the box (large
random forces, no short-range repulsion -> NaN positions ~step 1500) or,
scaled down, leaves the crystal unbound so it free-streams into a gas
whose Poisson occupancy fluctuations overflow the neighbor buckets.  A
PaiNN trained on LJ-argon labels gives a genuinely bound FCC crystal
that is stable in NVE at 30 K (LJ argon melts at ~84 K), with the exact
same kernel shapes and FLOPs as any other PaiNN-128x3.

Labels: the same smooth healing-cutoff LJ form as
schnetpack_tpu.md.calculators.LJCalculator (parity with the reference's
lj_calculator.py), epsilon = 0.0103 eV, r_min = 3.82 A (argon), rc = 5 A.

Training configs: 3x3x3-cell FCC supercells (108 atoms, PBC) with
Gaussian jitter up to 0.35 A plus +-2% isotropic strain — covers the
30 K thermal ellipsoid with a wide margin, including the repulsive wall.

Output: scripts/assets/bench_painn_argon.msgpack (flax params pytree),
loaded by bench.py.  Run: python scripts/train_bench_potential.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EPS = 0.0103        # eV (argon: epsilon/kB ~ 120 K)
R_MIN = 3.82        # A  (2^(1/6) * sigma, sigma = 3.4 A)
SIGMA = R_MIN / 2.0 ** (1.0 / 6.0)
CUTOFF = 5.0
HEAL = 0.5
A_LAT = 5.26        # FCC lattice constant [A]


def lj_energy_forces(R: np.ndarray, cell: np.ndarray):
    """Smooth-cutoff LJ energy/forces, analytic numpy f64 (PBC)."""
    from schnetpack_tpu.transform.neighborlist import cell_list_neighbor_list

    ii, jj, S = cell_list_neighbor_list(R, CUTOFF, cell, np.ones(3, bool))
    off = S.astype(np.float64) @ cell
    rij = R[jj] - R[ii] + off                       # i -> j
    d = np.sqrt((rij ** 2).sum(-1))
    sr6 = (SIGMA / d) ** 6
    e = 4.0 * EPS * (sr6 * sr6 - sr6)
    de = 4.0 * EPS * (-12.0 * sr6 * sr6 + 6.0 * sr6) / d
    r_on = CUTOFF - HEAL
    t = np.clip((d - r_on) / HEAL, 0.0, 1.0)
    sw = 1.0 - t * t * (3.0 - 2.0 * t)
    dsw = np.where((d > r_on) & (d < CUTOFF), -6.0 * t * (1.0 - t) / HEAL,
                   0.0)
    # dE/dd per (double-counted) edge; F_i = -dE/dR_i
    g_d = 0.5 * (de * sw + e * dsw)                 # [E]
    gvec = (g_d / d)[:, None] * rij                 # dE/dR_j direction
    F = np.zeros_like(R)
    np.add.at(F, jj, -gvec)
    np.add.at(F, ii, gvec)
    return float(0.5 * np.sum(e * sw)), F


def make_dataset(n_samples: int, seed: int):
    from schnetpack_tpu import properties as P
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    rng = np.random.RandomState(seed)
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos0 = np.concatenate([
        (base + [i, j, k]) * A_LAT
        for i in range(3) for j in range(3) for k in range(3)
    ])
    nbt = NeighborListTransform(CUTOFF)
    samples = []
    for s in range(n_samples):
        amp = rng.uniform(0.01, 0.35)
        strain = 1.0 + rng.uniform(-0.02, 0.02)
        cell = np.eye(3) * (A_LAT * 3 * strain)
        R = pos0 * strain + rng.randn(*pos0.shape) * amp
        e, f = lj_energy_forces(R, cell)
        sample = {
            P.Z: np.full(len(R), 18, np.int64),
            P.R: R.astype(np.float64),
            P.cell: cell,
            P.pbc: np.ones(3, bool),
            P.energy: np.array([e]),
            P.forces: f,
        }
        samples.append(nbt(sample))
        if (s + 1) % 100 == 0:
            print(f"labelled {s + 1}/{n_samples}", flush=True)
    return samples


def main(n_train: int = 512, n_val: int = 64, steps: int = 8000,
         batch: int = 32):
    import jax
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import padding_for, collate
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.train import AtomisticTask, ModelOutput
    from schnetpack_tpu.train.callbacks import save_pytree

    t0 = time.time()
    data = make_dataset(n_train + n_val, seed=11)
    train, val = data[:n_train], data[n_train:]
    from schnetpack_tpu.data.loader import PaddingSpec, round_up

    max_pairs = max(len(s[P.idx_i]) for s in data)
    n_at = len(data[0][P.Z])
    spec = PaddingSpec(
        n_atoms=round_up(batch * n_at + 1, 16),
        n_pairs=round_up(int(batch * max_pairs * 1.02), 128),
        n_molecules=batch + 1,
    )
    print(f"dataset in {time.time() - t0:.0f}s; padding {spec}", flush=True)

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20,
                             cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    task = AtomisticTask(
        pot,
        outputs=[
            ModelOutput(P.energy, loss_fn="mse", loss_weight=0.01),
            ModelOutput(P.forces, loss_fn="mse", loss_weight=0.99),
        ],
        learning_rate=5e-4,
        warmup_steps=200,
    )
    rng = np.random.RandomState(0)
    # pre-collate a pool of fixed batches: host-side collate costs
    # ~0.6 s/step on this 1-core box and would dominate the TPU step
    n_pool = 96
    pool = []
    for p in range(n_pool):
        idx = rng.choice(n_train, batch, replace=False)
        pool.append({k: jnp.asarray(v) for k, v in
                     collate([train[i] for i in idx], spec).items()})
    b0 = pool[0]
    state = task.create_state(jax.random.PRNGKey(0), b0)
    step_fn = jax.jit(task._train_step_impl, donate_argnums=0)

    t0 = time.time()
    for it in range(steps):
        state, metrics = step_fn(state, pool[it % n_pool])
        if (it + 1) % 500 == 0:
            loss = float(jax.device_get(metrics["train_loss"][0]))
            print(f"step {it + 1}/{steps} loss {loss:.6f} "
                  f"({(time.time() - t0) / (it + 1) * 1e3:.0f} ms/step)",
                  flush=True)

    # validation force MAE (eV/A)
    params = jax.device_get(state.ema_params
                            if state.ema_params is not None else state.params)
    apply = jax.jit(lambda p, b: pot.apply(p, b))
    maes, emaes = [], []
    for i in range(0, n_val, batch):
        chunk = val[i:i + batch]
        b = {k: jnp.asarray(v) for k, v in collate(chunk, spec).items()}
        out = apply(params, b)
        f_pred = np.asarray(jax.device_get(out[P.forces]))
        e_pred = np.asarray(jax.device_get(out[P.energy]))
        a0 = 0
        for m, s in enumerate(chunk):
            na = len(s[P.Z])
            maes.append(np.abs(f_pred[a0:a0 + na] - s[P.forces]).mean())
            emaes.append(abs(e_pred[m] - s[P.energy][0]) / na)
            a0 += na
    print(f"val force MAE {np.mean(maes) * 1e3:.2f} meV/A; "
          f"energy MAE {np.mean(emaes) * 1e3:.3f} meV/atom", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "assets",
                            "bench_painn_argon.msgpack")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    save_pytree(out_path, params)
    print(f"saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
