"""On-device rebuild of the column-bucketed neighbor state.

The host rebuild (ops/cellblock.build_column_layout) costs ~100 ms at 10k
atoms plus a device->host->device round trip of all positions — SURVEY §7
item 8 calls removing it "the single biggest TPU win".  This module
rebuilds the per-edge state (qcol/dcol/offsets/emask) entirely on device,
under jit, with all shapes static:

* the xy-grid, column capacity P, bucket capacities and the atom->slot
  assignment stay FIXED (atoms are not re-binned — their slot in the
  sorted table is permanent between HOST rebuilds).  Validity: an edge of
  length <= rc stays within the 9-column stencil as long as accumulated
  drift since the host build is below the stencil slack
  (column edge - rc); the neighbor-list driver tracks that drift and
  falls back to a host rebuild when it is exceeded;
* candidate edges are the 9 neighbor columns' P x P pairs; periodic
  images use the minimum-image convention (valid while every periodic box
  height > 2 * build cutoff — checked by the caller), evaluated on the
  bead centroid so ring-polymer replicas share one image choice;
* per (column, bucket) compaction runs as a key/payload sort (real edges
  first, original order preserved), sliced to the static bucket capacity.
  Overflow is reported as a scalar so the driver can fall back to a host
  rebuild instead of silently dropping edges.

Replaces the per-step host neighbor processing of the reference
(`md/neighborlist_md.py:100-189`).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .cellblock_pallas import COL_OFFSETS


@functools.partial(jax.jit, static_argnames=("nx", "ny", "P", "ksizes", "rc"))
def rebuild_column_state(
    R_beads: jax.Array,      # [S, A', 3] sorted-table positions (>=1 bead)
    slot_mask: jax.Array,    # [A'] 1.0 for real atoms
    cell: jax.Array,         # [3, 3]
    nx: int, ny: int, P: int, ksizes: Tuple[int, ...], rc: float,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Recompute qcol/dcol/coff/emask on device; returns (state, overflow).

    The edge set is the union over beads (axis 0 of ``R_beads``); images
    are chosen by minimum-image on the bead centroid.
    """
    S, A, _ = R_beads.shape
    dt = R_beads.dtype
    R4 = R_beads.reshape(S, nx, ny, P, 3)
    cen4 = jnp.mean(R4, axis=0)                       # [nx, ny, P, 3]
    valid = (slot_mask > 0).reshape(nx, ny, P)
    inv_cell = jnp.linalg.inv(cell)
    rc2 = jnp.asarray(rc * rc, dt)

    qcols, dcols, offs, emasks, ovf = [], [], [], [], jnp.zeros((), bool)
    p_ids = jnp.arange(P, dtype=jnp.int32)
    for c9, (dx, dy) in enumerate(COL_OFFSETS):
        kc = ksizes[c9]
        roll = lambda a: jnp.roll(a, (-dx, -dy), axis=(0, 1))
        # centroid image choice for this bucket's source columns
        diff_c = roll(cen4)[:, :, None, :, :] - cen4[:, :, :, None, :]
        frac = jnp.einsum("...i,ij->...j", diff_c, inv_cell)
        # clip: positions are not wrapped during MD; the drift guard
        # forces a host rebuild long before |shift| could exceed 1
        shift = jnp.clip(-jnp.round(frac), -1.0, 1.0)  # [nx,ny,P,P,3]
        off_c = jnp.einsum("...i,ij->...j", shift, cell)

        # union-over-beads cutoff mask with the shared image offset
        def bead_mask(s, acc):
            d = (jnp.roll(R4[s], (-dx, -dy), axis=(0, 1))[:, :, None, :, :]
                 - R4[s][:, :, :, None, :]) + off_c
            return acc | (jnp.sum(d * d, axis=-1) < rc2)

        within = jax.lax.fori_loop(
            0, S, bead_mask,
            jnp.zeros((nx, ny, P, P), bool))
        mask = within & valid[:, :, :, None] & roll(valid)[:, :, None, :]
        if dx == 0 and dy == 0:
            # exclude self pairs unless they are genuine periodic images
            self_pair = (p_ids[:, None] == p_ids[None, :])[None, None]
            real_image = jnp.any(jnp.abs(shift) > 0.5, axis=-1)
            mask = mask & (~self_pair | real_image)

        # compact (dest p, src q) pairs bucket-first via key/payload sort
        m2 = mask.reshape(nx * ny, P * P)
        iota = jnp.arange(P * P, dtype=jnp.int32)[None, :]
        key = jnp.where(m2, iota, P * P + iota)
        sx = (shift[..., 0] + 1).astype(jnp.int32)
        sy = (shift[..., 1] + 1).astype(jnp.int32)
        sz = (shift[..., 2] + 1).astype(jnp.int32)
        payload = (
            (iota << 6) | (sx.reshape(nx * ny, -1) << 4)
            | (sy.reshape(nx * ny, -1) << 2) | sz.reshape(nx * ny, -1)
        )
        _, packed = jax.lax.sort_key_val(key, payload, dimension=-1)
        packed = packed[:, :kc]                       # [ncol, kc]
        count = jnp.sum(m2, axis=-1)                  # [ncol]
        ovf = ovf | jnp.any(count > kc)
        live = jnp.arange(kc, dtype=jnp.int32)[None, :] < count[:, None]

        pq = packed >> 6
        p_dst = (pq // P).astype(jnp.int32)
        q_src = (pq % P).astype(jnp.int32)
        sh = jnp.stack([
            ((packed >> 4) & 3) - 1,
            ((packed >> 2) & 3) - 1,
            (packed & 3) - 1,
        ], axis=-1).astype(dt)
        off_e = jnp.einsum("...i,ij->...j", sh, cell)  # [ncol, kc, 3]

        qcols.append(jnp.where(live, q_src, -1))
        dcols.append(jnp.where(live, p_dst, -1))
        offs.append(off_e * live[..., None])
        emasks.append(live.astype(dt))

    shp = (nx, ny, -1)
    qcol = jnp.concatenate(qcols, axis=1).reshape(shp)
    dcol = jnp.concatenate(dcols, axis=1).reshape(shp)
    coff = jnp.concatenate(offs, axis=1).reshape(nx, ny, -1, 3)
    emask = jnp.concatenate(emasks, axis=1).reshape(shp)
    state = {
        "qcol": qcol,
        "dcol": dcol,
        "coff": coff,
        "coff_fm": jnp.moveaxis(coff, 3, 2),
        "emask": emask,
    }
    return state, ovf


@functools.partial(jax.jit, static_argnames=("nx", "ny", "P", "ksizes", "rc"))
def rebin_and_rebuild(
    positions: jax.Array,    # [S, A_canon, 3] canonical-order positions
    order: jax.Array,        # [A'] old slot -> canonical atom (0 at pads)
    slot_mask: jax.Array,    # [A'] 1.0 for real atoms (old binning)
    Z_s: jax.Array,          # [A'] sorted-space atomic numbers
    idx_m_s: jax.Array,      # [A'] sorted-space molecule ids
    cell: jax.Array,
    nx: int, ny: int, P: int, ksizes: Tuple[int, ...], rc: float,
):
    """Full on-device rebuild INCLUDING re-binning: atoms are re-sorted
    into their current xy-columns (bead-centroid fractional coordinates,
    z-ordered within a column) with one device sort, the sorted-space
    tables are re-permuted, and the edge state is rebuilt.  Nothing
    crosses to the host but a scalar overflow flag.

    Returns (state dict incl. the new order/rank/Z/idx_m/atom_mask,
    overflow flag).  Overflow (column occupancy > P or bucket occupancy >
    capacity) means the caller must fall back to the host builder.
    """
    S, Acan, _ = positions.shape
    Ap = order.shape[0]
    n_cols = nx * ny
    dt = positions.dtype
    R_old = jnp.take(positions, order, axis=1)          # [S, A', 3]
    cen = jnp.mean(R_old, axis=0)
    frac = jnp.einsum("ai,ij->aj", cen, jnp.linalg.inv(cell))
    frac = frac - jnp.floor(frac)
    colx = jnp.clip((frac[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
    coly = jnp.clip((frac[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
    col = jnp.where(slot_mask > 0, colx * ny + coly, n_cols)
    key = col.astype(jnp.float32) + frac[:, 2].astype(jnp.float32) * 0.999
    perm = jnp.argsort(key)                              # sorted -> old slot
    s = col[perm]
    first = jnp.searchsorted(s, s, side="left")
    within = jnp.arange(Ap, dtype=jnp.int32) - first.astype(jnp.int32)
    real = s < n_cols
    ovf = jnp.any(real & (within >= P))
    tgt = jnp.where(real & (within < P), s * P + within, Ap)

    inv_map = jnp.full(Ap + 1, -1, jnp.int32).at[tgt].set(
        perm.astype(jnp.int32), mode="drop")[:Ap]
    new_mask = inv_map >= 0
    safe = jnp.clip(inv_map, 0)
    order_new = jnp.take(order, safe) * new_mask
    Z_new = jnp.take(Z_s, safe) * new_mask
    idxm_new = jnp.take(idx_m_s, safe) * new_mask
    slots = jnp.arange(Ap, dtype=order_new.dtype)
    rank_new = jnp.zeros(Acan + 1, order_new.dtype).at[
        jnp.where(new_mask, order_new, Acan)
    ].set(slots, mode="drop")[:Acan]

    mask_f = new_mask.astype(dt)
    R_new = jnp.take(positions, order_new, axis=1) * mask_f[None, :, None]
    edges, ovf_b = rebuild_column_state(
        R_new, mask_f, cell, nx=nx, ny=ny, P=P, ksizes=ksizes, rc=rc)
    state = dict(edges)
    state.update({
        "order": order_new,
        "rank": rank_new,
        "Z": Z_new,
        "idx_m": idxm_new,
        "atom_mask": mask_f,
    })
    return state, ovf | ovf_b
