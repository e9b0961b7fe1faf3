"""GSPMD atom sharding — the simple fallback decomposition.

Shards the *atom dimension* of a padded dense-layout batch over a mesh
axis and lets XLA's SPMD partitioner place the collectives: per
interaction block the feature table is all-gathered over ICI.  Per-device
memory stays O(total atoms), so this only suits mid-size systems and
sharded training batches.

For large systems use the real spatial decomposition instead:
``parallel/columns.py`` (slab-sharded column layout, ppermute halo
exchange, O(A/n + halo) per-device traffic) — the TPU analog of the
reference's LAMMPS MPI local+ghost scheme (``pair_schnetpack.cpp``,
SURVEY §2.12).

Usage:
    mesh = make_mesh(8, axis_names=("atoms",))
    sharded_batch, out_shardings = shard_batch_by_atoms(batch, mesh)
    step = jax.jit(pot.apply, in_shardings=(None, shardings))
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .. import properties as structure

#: keys whose leading axis is the atom axis
_ATOM_KEYS = {
    structure.Z, structure.R, structure.idx_m, structure.atom_mask,
    structure.nbh_idx, structure.nbh_mask, structure.nbh_offsets,
    structure.nbh_rev, structure.forces,
}
#: keys whose leading axis is the pair axis (shard those too)
_PAIR_KEYS = {
    structure.idx_i, structure.idx_j, structure.offsets, structure.pair_mask,
    structure.idx_i_lr, structure.idx_j_lr, structure.offsets_lr,
    structure.pair_mask_lr,
}


def batch_shardings(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "atoms"):
    """PartitionSpecs for every batch key: atom/pair-leading arrays sharded
    over ``axis``, per-molecule data replicated."""
    n = mesh.shape[axis]
    specs = {}
    for k, v in batch.items():
        shape = np.shape(v)
        if k in _ATOM_KEYS or k in _PAIR_KEYS:
            if shape and shape[0] % n == 0:
                specs[k] = P(axis)
            else:
                specs[k] = P()
        else:
            specs[k] = P()
    return {k: NamedSharding(mesh, s) for k, s in specs.items()}


def shard_batch_by_atoms(
    batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "atoms"
) -> Tuple[Dict, Dict]:
    """Device-put the batch with atom/pair axes sharded over the mesh."""
    shardings = batch_shardings(batch, mesh, axis)
    placed = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    return placed, shardings


def pad_batch_for_mesh(batch: Dict[str, np.ndarray], n_devices: int) -> Dict[str, np.ndarray]:
    """Pad atom/pair axes up to multiples of ``n_devices`` (padding atoms
    follow the standard conventions: Z=0, idx_m -> pad molecule, masks 0)."""
    out = dict(batch)
    A = len(batch[structure.Z])
    M = batch[structure.n_atoms].shape[0]

    def pad_to(x, target, fill):
        n = target - x.shape[0]
        if n <= 0:
            return x
        padding = np.full((n,) + x.shape[1:], fill, dtype=x.dtype)
        return np.concatenate([x, padding])

    A2 = -(-A // n_devices) * n_devices
    if A2 != A:
        out[structure.Z] = pad_to(batch[structure.Z], A2, 0)
        out[structure.R] = pad_to(batch[structure.R], A2, 0.0)
        out[structure.idx_m] = pad_to(batch[structure.idx_m], A2, M - 1)
        out[structure.atom_mask] = pad_to(batch[structure.atom_mask], A2, 0.0)
        for k in (structure.nbh_idx, structure.nbh_rev):
            if k in batch:
                out[k] = pad_to(batch[k], A2, A - 1 if k == structure.nbh_idx else 0)
        if structure.nbh_mask in batch:
            out[structure.nbh_mask] = pad_to(batch[structure.nbh_mask], A2, 0.0)
        if structure.nbh_offsets in batch:
            out[structure.nbh_offsets] = pad_to(batch[structure.nbh_offsets], A2, 0.0)
    for k in _PAIR_KEYS:
        if k in out:
            Pn = out[k].shape[0]
            P2 = -(-Pn // n_devices) * n_devices
            fill = 0.0 if out[k].dtype.kind == "f" else (A2 - 1)
            if "mask" in k:
                fill = 0.0
            out[k] = pad_to(out[k], P2, fill)
    return out
