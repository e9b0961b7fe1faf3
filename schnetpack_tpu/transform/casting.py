"""dtype casting transforms (parity: ``src/schnetpack/transform/casting.py``)."""
from __future__ import annotations

from typing import Dict

import numpy as np

from .base import Transform


class CastMap(Transform):
    is_preprocessor = True
    is_postprocessor = True

    def __init__(self, type_map: Dict[str, str]):
        self.type_map = type_map

    def __call__(self, inputs):
        for k, v in list(inputs.items()):
            vt = str(np.asarray(v).dtype) if not hasattr(v, "dtype") else str(v.dtype)
            if vt in self.type_map:
                tgt = self.type_map[vt]
                if hasattr(v, "astype"):
                    inputs[k] = v.astype(tgt)
                else:
                    inputs[k] = np.asarray(v).astype(tgt)
        return inputs


class CastTo32(CastMap):
    def __init__(self):
        super().__init__({"float64": "float32", "int64": "int32"})


class CastTo64(CastMap):
    def __init__(self):
        super().__init__({"float32": "float64"})
