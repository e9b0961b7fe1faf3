from .base import AtomisticCore, AtomisticModel, NeuralNetworkPotential

__all__ = ["AtomisticCore", "AtomisticModel", "NeuralNetworkPotential"]
