from .base import ComposedTransform, Transform
from .neighborlist import (
    ASENeighborList,
    CachedNeighborList,
    CollectAtomTriples,
    CountNeighbors,
    FilterNeighbors,
    MatScipyNeighborList,
    NeighborListTransform,
    SkinNeighborList,
    TorchNeighborList,
    VesinNeighborList,
    WrapPositions,
)

__all__ = [
    "ComposedTransform", "Transform",
    "ASENeighborList", "CachedNeighborList", "CollectAtomTriples",
    "CountNeighbors", "FilterNeighbors", "MatScipyNeighborList",
    "NeighborListTransform", "SkinNeighborList", "TorchNeighborList",
    "VesinNeighborList", "WrapPositions",
]
