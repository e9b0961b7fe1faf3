"""Host-side neighbor-list construction (training data pipeline).

The reference ships four interchangeable backends (ase / matscipy / vesin /
torch; ``src/schnetpack/transform/neighborlist.py``).  None of those
libraries is a dependency here, so this module provides a self-contained
NumPy implementation of the standard shift-enumeration algorithm (the same
math as ASE's ``primitive_neighbor_list`` and the reference's
``TorchNeighborList``, ``neighborlist.py:428-553``) plus an O(N) cell-list
backend accelerated by the native C++ extension when available.

All backends return *full* (bidirectional) pair lists sorted by center atom.
Offsets are returned as integer cell shifts; Cartesian offsets are computed
as ``S @ cell``.
"""
from __future__ import annotations

import itertools
from typing import Dict, Optional, Tuple

import numpy as np

from .. import properties
from .base import Transform


def _enumerate_shifts(cell: np.ndarray, pbc: np.ndarray, cutoff: float) -> np.ndarray:
    """Integer shift vectors needed to cover ``cutoff`` in periodic dims."""
    if not pbc.any():
        return np.zeros((1, 3), dtype=np.int64)
    # perpendicular heights of the cell: 1/|row_i of inv(cell)^T|
    inv = np.linalg.inv(cell)
    heights = 1.0 / np.linalg.norm(inv, axis=1)
    n_rep = np.where(pbc, np.ceil(cutoff / heights).astype(np.int64), 0)
    ranges = [np.arange(-n, n + 1) for n in n_rep]
    shifts = np.array(list(itertools.product(*ranges)), dtype=np.int64)
    return shifts


def neighbor_list(
    positions: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray] = None,
    pbc: Optional[np.ndarray] = None,
    shift_chunk: int = 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Brute-force full neighbor list (works for molecules and PBC cells).

    Returns ``(idx_i, idx_j, S)`` with ``S`` integer shifts such that
    ``Rij = R[j] + S @ cell - R[i]`` and ``|Rij| < cutoff``.
    """
    R = np.asarray(positions, dtype=np.float64)
    n = R.shape[0]
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros((0, 3), dtype=np.int64)
    if cell is None or pbc is None or not np.asarray(pbc).any():
        diff = R[None, :, :] - R[:, None, :]
        d2 = np.sum(diff * diff, axis=-1)
        np.fill_diagonal(d2, np.inf)
        ii, jj = np.nonzero(d2 < cutoff * cutoff)
        order = np.lexsort((jj, ii))
        return (
            ii[order].astype(np.int64),
            jj[order].astype(np.int64),
            np.zeros((len(ii), 3), dtype=np.int64),
        )

    cell = np.asarray(cell, dtype=np.float64)
    pbc = np.asarray(pbc, dtype=bool)
    shifts = _enumerate_shifts(cell, pbc, cutoff)
    out_i, out_j, out_s = [], [], []
    c2 = cutoff * cutoff
    for start in range(0, len(shifts), shift_chunk):
        S = shifts[start: start + shift_chunk]  # [s,3]
        disp = S.astype(np.float64) @ cell  # [s,3]
        # diff[i,j,s] = R[j] + disp[s] - R[i]
        diff = R[None, :, None, :] + disp[None, None, :, :] - R[:, None, None, :]
        d2 = np.einsum("ijsk,ijsk->ijs", diff, diff)
        # remove self pairs at zero shift
        zero = np.nonzero((S == 0).all(axis=1))[0]
        if len(zero):
            d2[np.arange(n), np.arange(n), zero[0]] = np.inf
        ii, jj, ss = np.nonzero(d2 < c2)
        out_i.append(ii)
        out_j.append(jj)
        out_s.append(S[ss])
    idx_i = np.concatenate(out_i).astype(np.int64)
    idx_j = np.concatenate(out_j).astype(np.int64)
    S = np.concatenate(out_s).astype(np.int64)
    order = np.lexsort((S[:, 2], S[:, 1], S[:, 0], idx_j, idx_i))
    return idx_i[order], idx_j[order], S[order]


def cell_list_neighbor_list(
    positions: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray] = None,
    pbc: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """O(N) linked-cell neighbor list; uses the C++ extension when built,
    otherwise falls back to the brute-force implementation."""
    try:
        from ..native import cellist

        return cellist.neighbor_list(positions, cutoff, cell, pbc)
    except Exception:
        return neighbor_list(positions, cutoff, cell, pbc)


class NeighborListTransform(Transform):
    """Adds ``_idx_i``, ``_idx_j``, ``_offsets`` (Cartesian) to a sample."""

    is_preprocessor = True

    def __init__(self, cutoff: float, long_range_cutoff: float = -1.0, backend: str = "auto"):
        self.cutoff = float(cutoff)
        self.long_range_cutoff = float(long_range_cutoff)
        self.backend = backend
        if self.long_range_cutoff > 0 and self.long_range_cutoff < self.cutoff:
            raise ValueError("long_range_cutoff must be >= cutoff")

    def _build(self, R, cutoff, cell, pbc):
        if self.backend == "brute":
            return neighbor_list(R, cutoff, cell, pbc)
        return cell_list_neighbor_list(R, cutoff, cell, pbc)

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        R = np.asarray(inputs[properties.R])
        cell = inputs.get(properties.cell)
        pbc = inputs.get(properties.pbc)
        build_cutoff = max(self.cutoff, self.long_range_cutoff)
        idx_i, idx_j, S = self._build(R, build_cutoff, cell, pbc)
        if cell is not None and np.asarray(pbc).any():
            offsets = S.astype(np.float64) @ np.asarray(cell, dtype=np.float64)
        else:
            offsets = np.zeros((len(idx_i), 3), dtype=np.float64)

        if self.long_range_cutoff > 0:
            # split into short-range and long-range lists (parity:
            # FilterShortRange, atomistic/distances.py:29-57)
            Rij = R[idx_j] + offsets - R[idx_i]
            d = np.linalg.norm(Rij, axis=1)
            short = d < self.cutoff
            inputs[properties.idx_i_lr] = idx_i
            inputs[properties.idx_j_lr] = idx_j
            inputs[properties.offsets_lr] = offsets
            idx_i, idx_j, offsets = idx_i[short], idx_j[short], offsets[short]

        inputs[properties.idx_i] = idx_i
        inputs[properties.idx_j] = idx_j
        inputs[properties.offsets] = offsets
        return inputs


class ASENeighborList(NeighborListTransform):
    """Uses ase.neighborlist when ase is importable, else native fallback."""

    def _build(self, R, cutoff, cell, pbc):
        try:
            from ase.neighborlist import primitive_neighbor_list

            c = np.zeros((3, 3)) if cell is None else np.asarray(cell)
            p = np.zeros(3, bool) if pbc is None else np.asarray(pbc, bool)
            if not p.any() and np.allclose(c, 0):
                c = np.eye(3) * (2 * cutoff + R.ptp(axis=0).max() + 1.0)
            idx_i, idx_j, S = primitive_neighbor_list(
                "ijS", p, c, R, cutoff, self_interaction=False
            )
            order = np.lexsort((idx_j, idx_i))
            return idx_i[order], idx_j[order], S[order]
        except ImportError:
            return neighbor_list(R, cutoff, cell, pbc)


class MatScipyNeighborList(NeighborListTransform):
    """matscipy backend when available; native cell-list fallback."""

    def _build(self, R, cutoff, cell, pbc):
        try:
            from matscipy.neighbours import neighbour_list as msnl

            c = np.asarray(cell) if cell is not None else None
            p = np.asarray(pbc, bool) if pbc is not None else np.zeros(3, bool)
            if c is None or not p.any():
                span = R.max(0) - R.min(0) + 2 * cutoff + 1.0
                c = np.diag(span)
            idx_i, idx_j, S = msnl("ijS", positions=R, cutoff=cutoff, cell=c, pbc=p)
            order = np.lexsort((idx_j, idx_i))
            return idx_i[order], idx_j[order], S[order]
        except ImportError:
            return cell_list_neighbor_list(R, cutoff, cell, pbc)


#: the reference's torch backend (transform/neighborlist.py:428-553 there)
#: is a device-tensor cell list; on TPU that role is served by the native
#: C++ cell list behind NeighborListTransform.
TorchNeighborList = NeighborListTransform


class VesinNeighborList(NeighborListTransform):
    """vesin backend when the package is importable, native fallback else
    (parity: reference transform/neighborlist.py:229-255).

    Mixed PBC (some axes periodic, some not) is unsupported by vesin — the
    reference raises; here we fall back to the native cell list (which
    handles mixed PBC correctly) and warn once so the backend divergence
    is visible rather than silent."""

    _warned_fallback = False

    def _build(self, R, cutoff, cell, pbc):
        try:
            from vesin import NeighborList as _VesinNL
        except ImportError:
            return cell_list_neighbor_list(R, cutoff, cell, pbc)

        p = np.zeros(3, bool) if pbc is None else np.asarray(pbc, bool)
        c = np.zeros((3, 3)) if cell is None else np.asarray(cell, float)
        if not p.any():
            # vesin requires a box even for open boundaries
            span = R.max(0) - R.min(0) + 2 * cutoff + 1.0
            c, periodic = np.diag(span), False
        elif not p.all():
            if not VesinNeighborList._warned_fallback:
                import warnings

                warnings.warn(
                    "vesin does not support mixed periodic boundary "
                    "conditions; falling back to the native cell list "
                    "for this structure", stacklevel=2,
                )
                VesinNeighborList._warned_fallback = True
            return cell_list_neighbor_list(R, cutoff, cell, pbc)
        else:
            periodic = True
        i, j, S = _VesinNL(cutoff=float(cutoff), full_list=True).compute(
            points=np.ascontiguousarray(R, float),
            box=np.ascontiguousarray(c, float),
            periodic=periodic, quantities="ijS",
        )
        order = np.lexsort((j, i))
        return (i[order].astype(np.int64), j[order].astype(np.int64),
                S[order].astype(np.int64))


class SkinNeighborList(Transform):
    """Verlet-skin wrapper: rebuild only when an atom moved more than skin/2
    (parity: ``transform/neighborlist.py:289-425``)."""

    is_preprocessor = True

    def __init__(self, base: NeighborListTransform, skin: float = 0.3):
        self.base = base
        self.skin = float(skin)
        self.base.cutoff += skin
        self._last_positions = None
        self._cache = None

    def __call__(self, inputs):
        R = np.asarray(inputs[properties.R])
        rebuild = (
            self._cache is None
            or self._last_positions is None
            or self._last_positions.shape != R.shape
            or np.max(np.sum((R - self._last_positions) ** 2, axis=1))
            > (self.skin / 2.0) ** 2
        )
        if rebuild:
            out = self.base(dict(inputs))
            self._cache = {
                k: out[k]
                for k in (properties.idx_i, properties.idx_j, properties.offsets)
            }
            self._last_positions = R.copy()
        inputs.update(self._cache)
        return inputs


class FilterNeighbors(Transform):
    """Keep only pairs where both atoms are in ``selected_atoms``
    (parity: ``neighborlist.py:556-589``)."""

    is_preprocessor = True

    def __init__(self, selected_atoms):
        self.selected = np.asarray(selected_atoms)

    def __call__(self, inputs):
        idx_i = inputs[properties.idx_i]
        idx_j = inputs[properties.idx_j]
        keep = np.isin(idx_i, self.selected) & np.isin(idx_j, self.selected)
        for k in (properties.idx_i, properties.idx_j, properties.offsets):
            inputs[k] = inputs[k][keep]
        return inputs


class CollectAtomTriples(Transform):
    """Build (i, j, k) triple indices from unique neighbor-pair combinations
    per center (parity: ``neighborlist.py:592-641``)."""

    is_preprocessor = True

    def __call__(self, inputs):
        idx_i = np.asarray(inputs[properties.idx_i])
        n_pairs = len(idx_i)
        _, counts = np.unique(idx_i, return_counts=True)
        tj, tk = [], []
        off = 0
        for c in counts:
            pj, pk = np.triu_indices(c, k=1)
            tj.append(pj + off)
            tk.append(pk + off)
            off += c
        if tj:
            pair_j = np.concatenate(tj)
            pair_k = np.concatenate(tk)
        else:
            pair_j = pair_k = np.zeros(0, dtype=np.int64)
        inputs[properties.idx_i_triples] = idx_i[pair_j] if n_pairs else np.zeros(0, np.int64)
        inputs[properties.idx_j_triples] = pair_j
        inputs[properties.idx_k_triples] = pair_k
        return inputs


class CountNeighbors(Transform):
    """Adds per-atom neighbor counts (parity: ``neighborlist.py:644-673``)."""

    is_preprocessor = True

    def __init__(self, sorted: bool = True):
        self.sorted = sorted

    def __call__(self, inputs):
        idx_i = inputs[properties.idx_i]
        n_atoms = len(inputs[properties.Z])
        counts = np.bincount(idx_i, minlength=n_atoms)
        inputs[properties.n_nbh] = counts.astype(np.int64)
        return inputs


class WrapPositions(Transform):
    """Wrap positions into the cell via fractional coordinates
    (parity: ``neighborlist.py:676-719``)."""

    is_preprocessor = True

    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def __call__(self, inputs):
        cell = np.asarray(inputs[properties.cell], dtype=np.float64)
        pbc = np.asarray(inputs[properties.pbc], bool)
        R = np.asarray(inputs[properties.R], dtype=np.float64)
        frac = R @ np.linalg.inv(cell)
        frac[:, pbc] = frac[:, pbc] % 1.0
        # guard against numerically-1.0 wraps
        frac[:, pbc] = np.where(frac[:, pbc] >= 1.0 - self.eps, 0.0, frac[:, pbc])
        inputs[properties.R] = frac @ cell
        return inputs


class CachedNeighborList(Transform):
    """On-disk per-sample cache for expensive neighbor lists (parity:
    ``neighborlist.py:36-156``); uses ``fcntl`` locking via utils.locking."""

    is_preprocessor = True

    def __init__(self, cache_path: str, base: NeighborListTransform, keep_cache: bool = False):
        import os

        self.cache_path = cache_path
        self.base = base
        self.keep_cache = keep_cache
        os.makedirs(cache_path, exist_ok=True)

    def __call__(self, inputs):
        import os

        from ..utils.locking import file_lock

        idx = int(inputs.get(properties.idx, np.array([-1])).reshape(-1)[0])
        cache_file = os.path.join(self.cache_path, f"nbl_{idx}.npz")
        keys = (properties.idx_i, properties.idx_j, properties.offsets)
        if idx >= 0 and os.path.exists(cache_file):
            with np.load(cache_file) as f:
                for k in keys:
                    inputs[k] = f[k]
            return inputs
        inputs = self.base(inputs)
        if idx >= 0:
            with file_lock(cache_file + ".lock"):
                np.savez(cache_file, **{k: inputs[k] for k in keys})
        return inputs

    def teardown(self):
        if not self.keep_cache:
            import shutil

            shutil.rmtree(self.cache_path, ignore_errors=True)
