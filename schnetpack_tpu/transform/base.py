"""Transform base class.

Parity: ``src/schnetpack/transform/base.py:18-50``.  Unlike the reference
(nn.Module subclass), transforms here are plain Python objects operating on
dicts of numpy arrays (preprocessors, run in the data pipeline on host) or
dicts of jax arrays (postprocessors, traced into the jitted model).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class Transform:
    is_preprocessor: bool = False
    is_postprocessor: bool = False

    def datamodule(self, value) -> None:
        """Hook for pulling dataset statistics; called once during setup."""

    def teardown(self) -> None:
        pass

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        raise NotImplementedError


class ComposedTransform(Transform):
    def __init__(self, transforms):
        self.transforms = list(transforms)
        self.is_preprocessor = all(t.is_preprocessor for t in self.transforms)
        self.is_postprocessor = all(t.is_postprocessor for t in self.transforms)

    def datamodule(self, value) -> None:
        for t in self.transforms:
            t.datamodule(value)

    def __call__(self, inputs):
        for t in self.transforms:
            inputs = t(inputs)
        return inputs
