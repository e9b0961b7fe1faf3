from .base import MDCalculator, PairwiseMDCalculator
from .lj import LJCalculator
from .orca import OrcaCalculator
from .spcfw import SPCFwCalculator
from .schnetpack_calculator import (
    EnsembleCalculator,
    SchNetPackCalculator,
    stack_ensemble_params,
)

__all__ = [
    "MDCalculator", "PairwiseMDCalculator", "LJCalculator", "SPCFwCalculator",
    "EnsembleCalculator", "OrcaCalculator", "SchNetPackCalculator", "stack_ensemble_params",
]
