from .callbacks import ModelCheckpoint, PredictionWriter, load_pytree, save_pytree
from .loop import CSVLogger, TensorBoardLogger, Trainer
from .lr_scheduler import ReduceLROnPlateau
from .task import (
    AtomisticTask,
    ConsiderOnlySelectedAtoms,
    ModelOutput,
    TrainState,
    UnsupervisedModelOutput,
    aggregate_metrics,
)

__all__ = [
    "ModelCheckpoint", "PredictionWriter", "load_pytree", "save_pytree",
    "CSVLogger", "TensorBoardLogger", "Trainer", "ReduceLROnPlateau",
    "AtomisticTask", "ConsiderOnlySelectedAtoms", "ModelOutput",
    "TrainState", "UnsupervisedModelOutput", "aggregate_metrics",
]
