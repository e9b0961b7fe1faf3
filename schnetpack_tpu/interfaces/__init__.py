from .ase_interface import (
    AbsoluteUncertainty,
    AseInterface,
    AtomsConverter,
    RelativeUncertainty,
    SpkCalculator,
    SpkEnsembleCalculator,
)
from .batchwise import (
    ASEBatchwiseLBFGS,
    BatchwiseCalculator,
    BatchwiseEnsembleCalculator,
    batchwise_lbfgs,
)

__all__ = [
    "AbsoluteUncertainty", "AseInterface", "AtomsConverter",
    "RelativeUncertainty", "SpkCalculator", "SpkEnsembleCalculator",
    "ASEBatchwiseLBFGS", "BatchwiseCalculator", "BatchwiseEnsembleCalculator",
    "batchwise_lbfgs",
]
