from . import calculators, simulation_hooks, utils
from .initial_conditions import Initializer, MaxwellBoltzmannInit, UniformInit
from .integrators import NPTRingPolymer, NPTVelocityVerlet, RingPolymer, VelocityVerlet
from .neighborlist_md import AllPairsNeighborListMD
from .simulator import Simulator, SimulatorState
from .system import System, load_molecules

__all__ = [
    "calculators", "simulation_hooks", "utils",
    "Initializer", "MaxwellBoltzmannInit", "UniformInit",
    "NPTRingPolymer", "NPTVelocityVerlet", "RingPolymer", "VelocityVerlet",
    "AllPairsNeighborListMD", "Simulator", "SimulatorState",
    "System", "load_molecules",
]
