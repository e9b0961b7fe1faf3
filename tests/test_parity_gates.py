"""Parity-gate smokes on the reference's own QM9 test DB (real data).

Gate 1: SchNet QM9 U0 atomwise energy training converges (with atomref and
mean removal pulled from the datamodule — the full statistics pipeline).
Gate 3: PaiNN QM9 dipole-magnitude training with the vector-representation
dipole head.
"""
import os
import shutil

import jax
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, DipoleMoment, PairwiseDistances
from schnetpack_tpu.data import AtomsDataModule
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import PaiNN, SchNet
from schnetpack_tpu.train import AtomisticTask, ModelOutput, Trainer, aggregate_metrics
from schnetpack_tpu.transform import MatScipyNeighborList, RemoveOffsets, SubtractCenterOfMass

REFERENCE_DB = "/root/reference/tests/testdata/test_qm9.db"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_DB), reason="no reference QM9 test db"
)


def _dm(tmp_path, transforms):
    local = str(tmp_path / "qm9.db")
    shutil.copy(REFERENCE_DB, local)
    dm = AtomsDataModule(
        local, batch_size=8, num_train=14, num_val=6, num_test=0,
        split_file=str(tmp_path / "split.npz"),
        transforms=transforms,
        property_units={"energy_U0": "eV"},
    )
    dm.setup()
    return dm


def test_gate1_schnet_qm9_u0(tmp_path):
    dm = _dm(tmp_path, [
        SubtractCenterOfMass(),
        RemoveOffsets("energy_U0", remove_atomrefs=True, remove_mean=True),
        MatScipyNeighborList(5.0),
    ])
    # atomrefs in the DB are in Hartree; requested units are eV: the
    # statistics path must produce per-atom-corrected energies of O(eV)
    s = dm.train_dataset[0]
    assert abs(float(s["energy_U0"])) < 50.0  # raw U0 would be ~-11000 eV

    pot = NeuralNetworkPotential(
        representation=SchNet(n_atom_basis=32, n_interactions=2, n_rbf=10, cutoff=5.0),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key="energy_U0")],
    )
    task = AtomisticTask(
        pot, outputs=[ModelOutput("energy_U0", metrics=("mae",))],
        learning_rate=5e-3, warmup_steps=2,
    )
    state = task.create_state(jax.random.PRNGKey(0), next(iter(dm.train_dataloader())))
    loss0 = aggregate_metrics(
        [task.eval_step(state.params, b) for b in dm.train_dataloader()]
    )["val_loss"]
    trainer = Trainer(max_epochs=30, log_dir=str(tmp_path / "run"), progress=False)
    state = trainer.fit(task, state, dm.train_dataloader())
    loss1 = aggregate_metrics(
        [task.eval_step(state.params, b) for b in dm.train_dataloader()]
    )["val_loss"]
    assert loss1 < 0.3 * loss0


def test_gate3_painn_qm9_dipole(tmp_path):
    """RemoveOffsets shifts the atomrefs in the requested units correctly,
    and the dipole-magnitude head trains."""
    dm = _dm(tmp_path, [SubtractCenterOfMass(), MatScipyNeighborList(5.0)])
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=32, n_interactions=2, n_rbf=10, cutoff=5.0),
        input_modules=[PairwiseDistances()],
        output_modules=[
            DipoleMoment(use_vector_representation=True, predict_magnitude=True),
        ],
    )
    task = AtomisticTask(
        pot, outputs=[ModelOutput("dipole_moment", metrics=("mae",))],
        learning_rate=5e-3,
    )
    state = task.create_state(jax.random.PRNGKey(0), next(iter(dm.train_dataloader())))
    loss0 = aggregate_metrics(
        [task.eval_step(state.params, b) for b in dm.train_dataloader()]
    )["val_loss"]
    trainer = Trainer(max_epochs=30, log_dir=str(tmp_path / "run"), progress=False)
    state = trainer.fit(task, state, dm.train_dataloader())
    loss1 = aggregate_metrics(
        [task.eval_step(state.params, b) for b in dm.train_dataloader()]
    )["val_loss"]
    assert loss1 < 0.5 * loss0
