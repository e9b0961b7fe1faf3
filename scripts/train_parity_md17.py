"""Trained-model accuracy parity (VERDICT r2 #4, BASELINE north star #1).

The torch reference cannot be *trained* in this image (no schnetpack /
lightning install), so the protocol is label regeneration: the imported
reference-trained ``md_ethanol.model`` (elementwise-parity-verified, see
tests/test_parity_torch_numeric.py) defines the ground-truth potential;
an MD17-style ethanol dataset is sampled around the reference geometry
and labeled with its energies/forces, and a FRESH PaiNN with the
reference hyperparameters (PaiNN-128x3, 20 RBF, 5 A cutoff, silu) is
trained in THIS framework with the reference's md17 recipe
(loss weights 0.01/0.99, Adam 1e-3 + ReduceLROnPlateau;
reference configs/experiment/md17.yaml:57-70).

Reported: held-out force MAE / energy MAE in kcal/mol(/A), the units of
the published MD17 tables.  Results are recorded in PARITY.md.

Round-4 extensions (VERDICT r3 #2):
* ``student="schnet"`` trains a SchNet student (reference md17 recipe:
  128 features, 6 interactions, 20 Gaussian RBF — reference
  configs/model/representation/schnet.yaml) on the same teacher labels,
  converting "one model trains" into "the training stack is right".
* ``molecule="aspirin"`` runs the protocol at aspirin scale (21 atoms,
  C9H8O4).  The reference ships no aspirin-trained model, so the teacher
  is still the ethanol PaiNN — an extrapolated but smooth+bounded PES
  (sampling asserts the molecule stays associated); what is measured is
  the training stack at 21-atom complexity, vs the published
  PaiNN-aspirin force MAE 0.34 kcal/mol/A as the scale reference.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

EV2KCAL = 23.060547830619026

# PubChem-style 3D geometry of aspirin (C9H8O4, 21 atoms, Angstrom).
# Approximate gas-phase conformer; the sampling MD equilibrates it under
# the teacher potential before any frame is collected.
ASPIRIN_Z = np.array([6, 6, 6, 6, 6, 6,          # ring C1-C6
                      6, 8, 8,                   # carboxyl C, =O, -OH O
                      8, 6, 6, 8,                # ester O, acetyl C, CH3 C, acetyl =O
                      1, 1, 1, 1,                # ring H x4
                      1,                         # carboxyl OH H
                      1, 1, 1])                  # methyl H x3
ASPIRIN_R = np.array([
    [0.000, 0.000, 0.000],     # C1 (carboxyl-bearing)
    [1.396, 0.000, 0.000],     # C2 (ester-bearing)
    [2.090, 1.212, 0.000],     # C3
    [1.396, 2.424, 0.000],     # C4
    [0.000, 2.424, 0.000],     # C5
    [-0.698, 1.212, 0.000],    # C6
    [-0.770, -1.264, 0.030],   # C7 carboxyl C
    [-0.230, -2.360, 0.040],   # O8 =O
    [-2.110, -1.130, 0.050],   # O9 -OH
    [2.120, -1.190, 0.010],    # O10 ester O
    [2.480, -1.740, 1.190],    # C11 acetyl C
    [3.260, -2.990, 1.000],    # C12 methyl C
    [2.180, -1.250, 2.260],    # O13 acetyl =O
    [3.170, 1.210, 0.000],     # H on C3
    [1.940, 3.360, 0.000],     # H on C4
    [-0.545, 3.360, 0.000],    # H on C5
    [-1.780, 1.210, 0.000],    # H on C6
    [-2.630, -1.950, 0.060],   # H on O9 (anti, away from the ring)
    [4.050, -2.840, 1.710],    # H methyl
    [2.580, -3.760, 0.630],    # H methyl
    [3.760, -3.280, 1.920],    # H methyl
])


def main(n_train=900, n_val=100, epochs=400, seed=0, student="painn",
         molecule="ethanol"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import AtomsLoader, PaddingSpec
    from schnetpack_tpu.interfaces.torch_import import import_torch_model
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.train import (
        AtomisticTask, ModelOutput, Trainer, aggregate_metrics,
    )
    from schnetpack_tpu.train.lr_scheduler import ReduceLROnPlateau
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    # ---- teacher: the imported reference model -----------------------
    ref_pot, ref_params, info = import_torch_model(
        "/root/reference/tests/testdata/md_ethanol.model")

    if molecule == "aspirin":
        Z, R0 = ASPIRIN_Z, ASPIRIN_R
        na = len(Z)
    else:
        # base geometry from the reference testdata xyz
        lines = open("/root/reference/tests/testdata/md_ethanol.xyz").read().split("\n")
        na = int(lines[0])
        sym2z = {"H": 1, "C": 6, "O": 8}
        Z = np.array([sym2z[l.split()[0]] for l in lines[2:2 + na]])
        R0 = np.array([[float(x) for x in l.split()[1:4]] for l in lines[2:2 + na]])

    nlt = NeighborListTransform(info["cutoff"])
    # worst-case pair count for one molecule: all-to-all within cutoff
    pmax = na * (na - 1) + 8
    pad = PaddingSpec(n_atoms=na + 3, n_pairs=max(128, pmax), n_molecules=2)

    @jax.jit
    def teacher(batch):
        out = ref_pot.apply(ref_params, batch)
        return out["energy"], out["forces"]

    # ---- MD17-style sampling: teacher-driven Langevin MD snapshots ----
    # (random coordinate noise puts geometries far off the thermal
    # manifold — the teacher then yields huge forces and training on
    # them diverges; MD17 itself is an AIMD trajectory)
    from schnetpack_tpu.data.loader import collate
    from schnetpack_tpu.md import (
        MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
    )
    from schnetpack_tpu.md.simulation_hooks.thermostats import (
        LangevinThermostat,
    )
    from schnetpack_tpu.md.calculators import SchNetPackCalculator

    # aspirin runs on an extrapolated teacher (ethanol-trained PaiNN):
    # sample at a gentler 200 K so the unseen aromatic/ester moieties
    # stay on a smooth, bounded region of the teacher PES
    T_sample = 200.0 if molecule == "aspirin" else 300.0
    span_max = 9.5 if molecule == "aspirin" else 8.0
    mol = {P.Z: Z, P.R: R0, P.cell: np.zeros((3, 3)),
           P.pbc: np.zeros(3, bool)}
    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(T_sample).initialize_system(
        system, jax.random.PRNGKey(seed))
    # md_ethanol.model is an MD17-trained model: its outputs are
    # kcal/mol, NOT eV (reference tutorial_04_molecular_dynamics.ipynb
    # drives it with energy units "kcal/mol").  With the default eV the
    # forces are 23x too strong and the sampling MD dissociates ethanol
    # within ~0.25 ps.
    calc = SchNetPackCalculator(ref_pot, ref_params, cutoff=info["cutoff"],
                                energy_unit="kcal/mol")
    sim = Simulator(system, VelocityVerlet(0.5), calc,
                    simulator_hooks=[LangevinThermostat(T_sample, 100.0)],
                    progress=False, log_keys=("positions", "temperature"),
                    seed=seed)

    frames = []
    temps = []

    class Grab:
        def on_simulation_start(self, s):
            pass

        def on_simulation_end(self, s):
            pass

        def process_chunk(self, s, logs, start):
            frames.append(np.asarray(logs["positions"][:, 0]))
            temps.append(np.asarray(logs["temperature"]).ravel())

    sim.host_hooks.append(Grab())
    t0 = time.time()
    # equilibrate 2 ps before collecting — frames taken during thermal
    # equilibration sit off the 300 K manifold (rare high-energy
    # outliers that MSE amplifies and the student cannot fit)
    stride, equil = 10, 4000
    sim.simulate(stride * (n_train + n_val) + equil, chunk_size=400)
    R_frames = np.concatenate(frames)[equil::stride] * 10.0  # MD nm -> Ang
    R_frames = R_frames[: n_train + n_val]
    T_prod = np.concatenate(temps)[equil:]
    span = max(
        float(np.linalg.norm(f[:, None] - f[None], axis=-1).max())
        for f in R_frames[::100]
    )
    print(f"sampled {len(R_frames)} MD frames in {time.time()-t0:.1f}s; "
          f"<T>={T_prod.mean():.0f} K; max interatomic dist {span:.2f} A",
          flush=True)
    assert abs(T_prod.mean() - T_sample) < 0.2 * T_sample, "sampling off temperature"
    assert span < span_max, "molecule dissociated during sampling"

    samples = []
    t0 = time.time()
    for Rp in R_frames:
        s = {P.Z: Z, P.R: np.asarray(Rp, np.float64),
             P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool)}
        s = nlt(s)
        b = {k: jnp.asarray(v) for k, v in collate([s], pad).items()}
        e, f = teacher(b)
        s["energy"] = np.asarray(e[:1], np.float64)
        s["forces"] = np.asarray(f[:na], np.float64)
        samples.append(s)
    e_mean = float(np.mean([s["energy"][0] for s in samples]))
    for s in samples:
        s["energy"] = s["energy"] - e_mean
    e_arr = np.array([s["energy"][0] for s in samples])
    print(f"labeled {len(samples)} samples in {time.time()-t0:.1f}s; "
          f"mean |F| = {np.mean([np.abs(s['forces']).mean() for s in samples]):.3f} kcal/mol/A; "
          f"E spread std={e_arr.std():.3f} min={e_arr.min():.2f} "
          f"max={e_arr.max():.2f} kcal/mol", flush=True)

    class DS:
        def __init__(self, rows):
            self.rows = rows

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    train_loader = AtomsLoader(DS(samples[:n_train]), batch_size=32,
                               shuffle=True, padding=PaddingSpec(
                                   32 * (na + 1), 32 * pmax, 33))
    val_loader = AtomsLoader(DS(samples[n_train:]), batch_size=32,
                             shuffle=False, padding=PaddingSpec(
                                 32 * (na + 1), 32 * pmax, 33))

    # ---- student: fresh net, reference md17 recipe --------------------
    if student == "schnet":
        # reference configs/model/representation/schnet.yaml: 128
        # features, 6 interactions, 20 Gaussian RBF, ssp activation
        from schnetpack_tpu.representation import SchNet

        rep = SchNet(n_atom_basis=128, n_interactions=6, n_rbf=20,
                     cutoff=info["cutoff"])
        out_act = None
    else:
        rep = PaiNN(n_atom_basis=128, n_interactions=3, n_rbf=20,
                    cutoff=info["cutoff"], activation=jax.nn.silu)
        out_act = jax.nn.silu
    pot = NeuralNetworkPotential(
        representation=rep,
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key="energy",
                                 **({"activation": out_act} if out_act else {})),
                        Forces()],
    )
    task = AtomisticTask(
        pot,
        outputs=[
            ModelOutput("energy", loss_weight=0.01, metrics=("mae",)),
            ModelOutput("forces", loss_weight=0.99, metrics=("mae",)),
        ],
        learning_rate=1e-3,
        ema_decay=0.995,
    )
    state = task.create_state(jax.random.PRNGKey(1), next(iter(train_loader)))
    trainer = Trainer(
        max_epochs=epochs, log_dir="/tmp/md17_parity",
        scheduler=ReduceLROnPlateau(factor=0.5, patience=15, smoothing_factor=0.9),
        progress=False, val_every_n_epochs=5,
    )
    t0 = time.time()
    state = trainer.fit(task, state, train_loader, val_loader=val_loader)
    print(f"trained {epochs} epochs in {(time.time()-t0)/60:.1f} min",
          flush=True)

    m = aggregate_metrics([
        task.eval_step(task.eval_params(state), b) for b in val_loader
    ])
    f_mae = m.get("val_forces_mae")
    e_mae = m.get("val_energy_mae")
    # offset-corrected energy MAE: the reference recipe removes the mean
    # energy as an offset transform (configs/experiment/md17.yaml), so
    # relative energies are what the published tables measure
    eval_params = task.eval_params(state)
    d = []
    for s in samples[n_train:]:
        b = {k: jnp.asarray(v) for k, v in collate([s], pad).items()}
        out = pot.apply(eval_params, b, do_postprocessing=False)
        d.append(float(out["energy"][0]) - float(s["energy"][0]))
    d = np.array(d)
    e_mae_rel = float(np.abs(d - d.mean()).mean())
    print(f"== MD17-{molecule} label-regeneration parity "
          f"(student={student}) ==", flush=True)
    print(f"force MAE: {f_mae:.5f} kcal/mol/A = "
          f"{f_mae / EV2KCAL:.5f} eV/A", flush=True)
    print(f"energy MAE: {e_mae:.5f} kcal/mol "
          f"(offset-corrected: {e_mae_rel:.5f} kcal/mol; "
          f"constant residual {d.mean():+.4f})", flush=True)
    scale = np.mean([np.abs(s["forces"]).mean() for s in samples[n_train:]])
    print(f"mean |F| of labels: {scale:.4f} kcal/mol/A; "
          f"relative force MAE: {f_mae / scale * 100:.2f}%", flush=True)


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["epochs"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["student"] = sys.argv[2]
    if len(sys.argv) > 3:
        kw["molecule"] = sys.argv[3]
    main(**kw)
