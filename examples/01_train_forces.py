"""Train a PaiNN force field on a custom dataset (library API).

Equivalent CLI: python -m schnetpack_tpu.cli train experiment=md17 ...
"""
import jax
import numpy as np

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data import ASEAtomsData, AtomsDataModule
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import PaiNN
from schnetpack_tpu.train import (
    AtomisticTask,
    ModelCheckpoint,
    ModelOutput,
    ReduceLROnPlateau,
    Trainer,
)
from schnetpack_tpu.transform import MatScipyNeighborList, RemoveOffsets

CUTOFF = 5.0


def main(datapath: str = "data/my_dataset.db", epochs: int = 100):
    dm = AtomsDataModule(
        datapath,
        batch_size=32,
        num_train=0.8,
        num_val=0.1,
        transforms=[
            MatScipyNeighborList(CUTOFF),
            RemoveOffsets("energy", remove_mean=True),
        ],
    )
    dm.setup()

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=128, n_interactions=3, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key="energy"), Forces()],
    )
    task = AtomisticTask(
        pot,
        outputs=[
            ModelOutput("energy", loss_weight=0.01, metrics=("mae",)),
            ModelOutput("forces", loss_weight=0.99, metrics=("mae", "rmse")),
        ],
        learning_rate=5e-4,
        warmup_steps=100,
        ema_decay=0.995,
    )
    state = task.create_state(jax.random.PRNGKey(0), next(iter(dm.train_dataloader())))
    trainer = Trainer(
        max_epochs=epochs,
        log_dir="runs/example",
        scheduler=ReduceLROnPlateau(factor=0.8, patience=30),
        checkpoint=ModelCheckpoint("runs/example/checkpoints"),
    )
    state = trainer.fit(task, state, dm.train_dataloader(), dm.val_dataloader())
    print(trainer.test(task, state, dm.test_dataloader()))


if __name__ == "__main__":
    main()
