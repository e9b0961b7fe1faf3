"""End-to-end training smoke test: overfit a tiny synthetic dataset."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os

import jax
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import AtomsLoader, PaddingSpec
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from schnetpack_tpu.train import (
    AtomisticTask,
    ModelCheckpoint,
    ModelOutput,
    ReduceLROnPlateau,
    Trainer,
    aggregate_metrics,
)
from tests.conftest import random_molecule


class SyntheticDataset:
    """Molecules labelled with a smooth analytic energy/force target."""

    def __init__(self, n: int, seed: int = 0):
        rng = np.random.RandomState(seed)
        self.samples = []
        for _ in range(n):
            s = random_molecule(rng, 6, cutoff=5.0)
            R = s[properties.R]
            # pairwise Morse-like energy => smooth forces
            diff = R[None] - R[:, None]
            d = np.sqrt((diff**2).sum(-1) + np.eye(len(R)))
            e = np.exp(-(d - 1.5) ** 2)
            np.fill_diagonal(e, 0.0)
            s["energy"] = np.array(0.5 * e.sum())
            grad_d = -2 * (d - 1.5) * e
            np.fill_diagonal(grad_d, 0.0)
            unit = diff / d[..., None]
            s["forces"] = -(grad_d[..., None] * (-unit)).sum(axis=1)
            self.samples.append(s)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def tiny_training_run(tmp_path_factory):
    ds = SyntheticDataset(16)
    pad = PaddingSpec(n_atoms=64, n_pairs=512, n_molecules=9)
    loader = AtomsLoader(ds, batch_size=8, shuffle=True, padding=pad)

    pot = NeuralNetworkPotential(
        representation=SchNet(n_atom_basis=32, n_interactions=2, n_rbf=10, cutoff=5.0),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key="energy"), Forces()],
    )
    task = AtomisticTask(
        pot,
        outputs=[
            ModelOutput("energy", loss_weight=0.1, metrics=("mae",)),
            ModelOutput("forces", loss_weight=0.9, metrics=("mae", "rmse")),
        ],
        learning_rate=5e-3,
        warmup_steps=5,
        ema_decay=0.99,
    )
    state = task.create_state(jax.random.PRNGKey(0), next(iter(loader)))

    log_dir = str(tmp_path_factory.mktemp("run"))
    trainer = Trainer(
        max_epochs=12,
        log_dir=log_dir,
        scheduler=ReduceLROnPlateau(factor=0.5, patience=50),
        checkpoint=ModelCheckpoint(os.path.join(log_dir, "ckpt")),
        progress=False,
    )
    state = trainer.fit(task, state, loader, val_loader=loader)
    return task, state, loader, log_dir


def test_loss_decreases(tiny_training_run):
    task, state, loader, _ = tiny_training_run
    # loss after training should be much lower than an untrained model's
    fresh = task.create_state(jax.random.PRNGKey(7), next(iter(loader)))
    m_trained = aggregate_metrics([task.eval_step(state.params, b) for b in loader])
    m_fresh = aggregate_metrics([task.eval_step(fresh.params, b) for b in loader])
    assert m_trained["val_loss"] < 0.5 * m_fresh["val_loss"]


def test_checkpoint_roundtrip(tiny_training_run):
    import pickle

    task, state, loader, log_dir = tiny_training_run
    ckpt_file = os.path.join(log_dir, "ckpt", "last.ckpt")
    assert os.path.exists(ckpt_file)
    with open(ckpt_file, "rb") as f:
        payload = pickle.load(f)
    restored = payload["state"]
    m0 = aggregate_metrics([task.eval_step(state.params, b) for b in loader])
    m1 = aggregate_metrics([task.eval_step(restored.params, b) for b in loader])
    assert m0["val_loss"] == pytest.approx(m1["val_loss"], rel=1e-6)


def test_ema_params_differ_but_close(tiny_training_run):
    task, state, loader, _ = tiny_training_run
    leaves_p = jax.tree.leaves(state.params)
    leaves_e = jax.tree.leaves(state.ema_params)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(leaves_p, leaves_e)]
    assert max(diffs) > 0  # EMA lags behind
    assert max(diffs) < 1.0


def test_warmup_schedule(tiny_training_run):
    task, _, _, _ = tiny_training_run
    import jax.numpy as jnp

    # warmup_steps=5: lr at step 1 is 1/5 of base
    assert task.warmup_steps == 5
