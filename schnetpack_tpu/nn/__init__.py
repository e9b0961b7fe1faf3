from .base import MLP, Dense, Residual, ResidualMLP
from .cutoff import CosineCutoff, MollifierCutoff, SwitchFunction
from .embedding import ElectronicEmbedding, NuclearEmbedding, electron_config_matrix
from .equivariant import GatedEquivariantBlock, build_gated_equivariant_mlp
from .radial import BesselRBF, GaussianRBF, GaussianRBFCentered, make_radial_basis

__all__ = [
    "MLP", "Dense", "Residual", "ResidualMLP",
    "CosineCutoff", "MollifierCutoff", "SwitchFunction",
    "ElectronicEmbedding", "NuclearEmbedding", "electron_config_matrix",
    "GatedEquivariantBlock", "build_gated_equivariant_mlp",
    "BesselRBF", "GaussianRBF", "GaussianRBFCentered", "make_radial_basis",
]
