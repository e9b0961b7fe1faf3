"""Response-property transforms.

Parity: ``src/schnetpack/transform/response.py:11-54`` — ``SplitShielding``
splits per-atom shielding tensors into separate per-element keys so each
element can be trained/evaluated with its own output head.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .. import properties
from .base import Transform


class SplitShielding(Transform):
    is_preprocessor = True

    def __init__(
        self,
        shielding_key: str = properties.shielding,
        atomic_numbers: Sequence[int] = (1, 6, 7, 8),
    ):
        self.shielding_key = shielding_key
        self.atomic_numbers = list(atomic_numbers)

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        sigma = np.asarray(inputs[self.shielding_key])
        Z = np.asarray(inputs[properties.Z])
        for z in self.atomic_numbers:
            mask = (Z == z).astype(sigma.dtype)
            inputs[f"{self.shielding_key}_{z}"] = (
                sigma * mask.reshape((-1,) + (1,) * (sigma.ndim - 1))
            )
        return inputs
