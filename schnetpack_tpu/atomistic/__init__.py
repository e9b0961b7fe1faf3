from .atomwise import Aggregation, Atomwise, DipoleMoment, Polarizability
from .distances import FilterShortRange, PairwiseDistances
from .response import Forces, Response, StaticExternalFields, Strain

__all__ = [
    "Aggregation", "Atomwise", "DipoleMoment", "Polarizability",
    "FilterShortRange", "PairwiseDistances",
    "Forces", "Response", "StaticExternalFields", "Strain",
]
