"""On-device neighbor handling for MD.

The reference rebuilds neighbor lists on the CPU with skin heuristics and
re-collation every few steps (``md/neighborlist_md.py:55-189``) — a
device->host->device round trip in the middle of every MD step window.
The TPU-native design eliminates the round trip:

* ``AllPairsNeighborListMD`` — the pair *index set* (all intra-molecular
  ordered pairs) is static, so it is precomputed once on the host; the
  cutoff is applied **on device every step** as a mask folded into the
  model's ``pair_mask``, and periodic offsets come from the minimal-image
  convention (valid while cutoff <= half the smallest cell height, the
  standard MD setup).  No rebuilds, no host sync, no dynamic shapes —
  the entire simulation stays resident on the TPU.

For very large systems an O(N) on-device cell list (Pallas) can be swapped
in behind the same interface.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import properties as structure
from .system import System


@jax.jit
def _disp2(R, R0):
    """One fused dispatch (eager op chains cost a tunnel round trip each
    on remote TPUs)."""
    return jnp.max(jnp.sum((R - R0) ** 2, axis=-1))


class DenseNeighborListMD:
    """Dense [A, K] neighbor matrix with a Verlet skin for large systems.

    The index set is built on the host with the native C++ cell list
    (cutoff + skin) and stays FIXED inside a scan chunk; per step the model
    only recomputes displacements/cutoff masks on device.  The simulator
    calls ``maybe_rebuild`` between chunks: if any atom moved more than
    skin/2 since the last build, the matrix is rebuilt (parity with the
    reference's skin heuristic, ``md/neighborlist_md.py:55-98``, minus the
    per-step device->host round trip).
    """

    def __init__(self, cutoff: float, skin: float = 1.0, k_multiple: int = 4,
                 headroom: float = 1.15):
        self.cutoff = float(cutoff)
        self.skin = float(skin)
        self.k_multiple = k_multiple
        self.headroom = headroom
        self._nbh = None          # jnp [A, K]
        self._offsets = None      # jnp [A, K, 3]
        self._mask = None         # jnp [A, K]
        self._build_positions = None  # np [R, A, 3]
        self._build_positions_dev = None

    def build(self, system: System) -> None:
        from ..transform.neighborlist import cell_list_neighbor_list

        R_np = np.asarray(jax.device_get(system.positions))
        n_rep = system.n_replicas
        cells = np.asarray(jax.device_get(system.cells))[0]
        pbc = np.asarray(jax.device_get(system.pbc))
        idx_m = np.asarray(jax.device_get(system.idx_m))
        A = R_np.shape[1]

        # per-molecule neighbor lists merged into one [A, K] matrix; for
        # ring polymers the topology is the UNION over all beads (the
        # reference rebuilds per replica and merges,
        # md/neighborlist_md.py:55-98) — one shared [A, K] matrix then
        # serves every bead with per-bead displacements computed on device
        ii_all, jj_all, off_all = [], [], []
        for m in np.unique(idx_m):
            sel = np.nonzero(idx_m == m)[0]
            sub_pbc = pbc[m]
            sub_cell = cells[m] if sub_pbc.any() else None
            rows = []
            for r in range(n_rep):
                i, j, S = cell_list_neighbor_list(
                    R_np[r, sel], self.cutoff + self.skin,
                    sub_cell, sub_pbc if sub_pbc.any() else None,
                )
                rows.append(np.column_stack([i, j, S]).astype(np.int64))
            rows = np.concatenate(rows) if rows else np.zeros((0, 5), np.int64)
            if n_rep > 1 and len(rows):
                rows = np.unique(rows, axis=0)
            i, j, S = rows[:, 0], rows[:, 1], rows[:, 2:5]
            ii_all.append(sel[i])
            jj_all.append(sel[j])
            off = S.astype(np.float64) @ sub_cell if sub_cell is not None else np.zeros((len(i), 3))
            off_all.append(off)
        ii = np.concatenate(ii_all)
        jj = np.concatenate(jj_all)
        off = np.concatenate(off_all)
        order = np.argsort(ii, kind="stable")
        ii, jj, off = ii[order], jj[order], off[order]

        counts = np.bincount(ii, minlength=A)
        max_count = int(counts.max(initial=1))
        # generous headroom on the FIRST build: K changes force a recompile
        # of the whole scan, so leave room for densification under motion
        K = int(-(-int(max_count * self.headroom + 1) // self.k_multiple) * self.k_multiple)
        # keep K stable across rebuilds so the compiled scan is reused
        if self._nbh is not None and self._nbh.shape[1] >= K:
            K = self._nbh.shape[1]
        starts = np.zeros(A + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slots = np.arange(len(ii)) - starts[ii]
        nbh = np.full((A, K), A - 1, np.int32)
        mask = np.zeros((A, K), np.float32)
        offs = np.zeros((A, K, 3), np.float64)
        nbh[ii, slots] = jj
        offs[ii, slots] = off
        mask[ii, slots] = 1.0

        from ..ops.neighbor_gather import build_reverse_map

        rev = build_reverse_map(ii, jj, off, slots, A, K)

        dtype = system.positions.dtype
        if n_rep > 1:
            # shared topology, replica-shifted indices into the flattened
            # [n_rep * A] atom table the calculator builds
            shift = np.repeat(np.arange(n_rep) * A, A)[:, None]
            nbh = np.tile(nbh, (n_rep, 1)) + shift.astype(np.int32)
            offs = np.tile(offs, (n_rep, 1, 1))
            mask = np.tile(mask, (n_rep, 1))
            rshift = np.repeat(np.arange(n_rep) * (A * K), A)[:, None]
            rev = np.tile(rev, (n_rep, 1)) + rshift.astype(rev.dtype)
        self._nbh = jnp.asarray(nbh)
        self._offsets = jnp.asarray(offs, dtype)
        self._mask = jnp.asarray(mask, dtype)
        self._rev = jnp.asarray(rev)
        self._build_positions = R_np.copy()
        self._build_positions_dev = system.positions

    def displacement2(self, system: System):
        """Max squared displacement since the last build — a DEVICE scalar,
        so the simulator can fetch it together with the chunk logs in one
        round trip instead of pulling all positions every chunk."""
        if self._build_positions_dev is None:
            return None
        return _disp2(system.positions, self._build_positions_dev)

    def maybe_rebuild(self, system: System, disp2=None) -> bool:
        if self._nbh is None:
            self.build(system)
            return True
        if disp2 is None:
            R_np = np.asarray(jax.device_get(system.positions))
            disp2 = np.max(np.sum((R_np - self._build_positions) ** 2, axis=-1))
        if disp2 > (self.skin / 2.0) ** 2:
            self.build(system)
            return True
        return False

    def state(self) -> Dict[str, jax.Array]:
        """The device arrays the scan carries (rebuilt between chunks)."""
        return {
            structure.nbh_idx: self._nbh,
            structure.nbh_offsets: self._offsets,
            structure.nbh_mask: self._mask,
            structure.nbh_rev: self._rev,
            structure.nbh_cutoff: jnp.asarray(self.cutoff + self.skin),
        }


class CellBlockNeighborListMD:
    """Cell-blocked neighbor layout with a Verlet skin (the TPU fast path).

    Atoms are cell-sorted and the per-step neighbor gathers run as MXU
    selection matmuls (``ops/cellblock.py``) — no row gathers, no scatters.
    Host rebuilds happen between scan chunks only when an atom moved more
    than skin/2 (same heuristic as :class:`DenseNeighborListMD`).  The
    state dict carries the sorted-space system arrays so the MD scan stays
    fully on device between rebuilds.
    """

    def __init__(self, cutoff: float, skin: float = 0.6, k_multiple: int = 2,
                 capacity_headroom: int = 1, layout: str = "column",
                 jitter_fraction: float = 0.5,
                 bucket_headroom: float = 1.0 / 6.0,
                 precompute_onehots: Optional[bool] = None):
        self.cutoff = float(cutoff)
        # precomputed one-hot selection matrices for the message kernels
        # (static between rebuilds; kb_r5 measured the in-kernel VPU
        # one-hot build serializing with the MXU dots).  None = auto:
        # enabled while the tables stay under ~512 MB of HBM.
        self.precompute_onehots = precompute_onehots
        self.skin = float(skin)
        self.k_multiple = k_multiple
        self.capacity_headroom = capacity_headroom
        # first-build capacity probe: per-atom jitter amplitude as a
        # fraction of the skin.  0.5 (= skin/2) is the worst-case bound
        # (a rebuild fires before any atom moves farther than skin/2);
        # ordered/cold systems can use 0.25 to trim ~10-15% of bucket
        # padding (every message/geometry kernel scales with Ktot) at
        # the cost of a possible one-time recompile if a bucket later
        # overflows (the grow path stays correct either way).
        self.jitter_fraction = float(jitter_fraction)
        # extra per-bucket slot margin on top of the jitter-probed
        # occupancy (same tradeoff as jitter_fraction)
        self.bucket_headroom = float(bucket_headroom)
        self.layout_kind = layout  # "column" (fast kernels) | "atom"
        self._layout = None
        self._dims = None
        self._K = None
        self._C = None
        self._build_positions = None
        self._build_positions_dev = None
        self._host_build_positions_dev = None
        # on-device rebuild info is derived in build(); a fresh instance
        # (e.g. right after a checkpoint restore, before any build) must
        # not AttributeError when the scan trace probes it
        self._dev_rebuild = None
        self._state = None

    def build(self, system: System) -> None:
        from ..ops.cellblock import (
            CapacityError, build_cell_layout, build_column_layout,
        )

        n_rep = system.n_replicas
        if n_rep != 1 and self.layout_kind != "column":
            raise NotImplementedError(
                "the 27-cell layout supports n_replicas == 1; "
                "use layout='column' for ring-polymer MD"
            )
        R_all = np.asarray(jax.device_get(system.positions))   # [R, A, 3]
        # column assignment and stencil constraints are evaluated on the
        # bead centroid; the edge set is the UNION over beads (parity with
        # the reference's per-replica merge, md/neighborlist_md.py:55-98)
        R_np = R_all.mean(axis=0)
        cells = np.asarray(jax.device_get(system.cells))
        pbc = np.asarray(jax.device_get(system.pbc))
        rc = self.cutoff + self.skin
        M = system.n_molecules
        if M == 1:
            cell = cells[0, 0]
            use_pbc = pbc[0] if pbc[0].any() else None
            use_cell = cell if np.abs(cell).sum() > 0 else None
            R_build = R_np
            union_edges = None
            if n_rep > 1:
                from ..transform.neighborlist import cell_list_neighbor_list

                rows = []
                for r in range(n_rep):
                    i, j, S = cell_list_neighbor_list(
                        R_all[r], rc, use_cell, use_pbc
                    )
                    rows.append(np.column_stack([i, j, S]).astype(np.int64))
                rows = np.unique(np.concatenate(rows), axis=0)
                union_edges = (rows[:, 0], rows[:, 1], rows[:, 2:5])
        else:
            # Multi-molecule boxes: every molecule gets its own x-slab of
            # one virtual (non-periodic) domain, with a >= 2*rc gap so no
            # stencil bucket ever spans two molecules.  Column binning
            # runs on the TRANSLATED copies, while the per-edge geometry
            # in the kernels always reads the real positions, so physics
            # is untouched.  Batched *periodic* boxes stay on the dense
            # layout (reference semantics: md/neighborlist_md.py:55-98
            # merges per-molecule neighborhoods the same way).
            if pbc.any() or np.abs(cells).sum() > 0:
                raise NotImplementedError(
                    "the column layout batches non-periodic molecules; "
                    "use neighbor_list='dense' for multiple periodic boxes"
                )
            from ..transform.neighborlist import cell_list_neighbor_list

            use_pbc = None
            use_cell = None
            cell = cells[0, 0]
            idx_m = np.asarray(jax.device_get(system.idx_m))
            gap = 2.0 * rc
            translation = np.zeros_like(R_np)
            x_cursor = 0.0
            rows = []
            for m in range(M):
                sel = np.where(idx_m == m)[0]
                if len(sel) == 0:
                    continue
                lo = R_np[sel].min(axis=0)
                hi = R_np[sel].max(axis=0)
                translation[sel] = [x_cursor - lo[0], -lo[1], -lo[2]]
                x_cursor += (hi[0] - lo[0]) + gap
                for r in range(n_rep) if n_rep > 1 else (0,):
                    R_mol = (R_all[r] if n_rep > 1 else R_np)[sel]
                    i, j, S = cell_list_neighbor_list(R_mol, rc, None, None)
                    rows.append(np.column_stack(
                        [sel[i], sel[j], S]).astype(np.int64))
            rows = np.unique(np.concatenate(rows), axis=0)
            union_edges = (rows[:, 0], rows[:, 1], rows[:, 2:5])
            R_build = R_np + translation

        # fully-periodic boxes wider than 2*rc admit the alias-free
        # stencil the on-device rebuild needs — steer the autotune to it
        min_grid = 1
        if use_cell is not None and pbc[0].all():
            inv_c = np.linalg.inv(np.asarray(cell, np.float64))
            if np.all(1.0 / np.linalg.norm(inv_c, axis=1) > 2 * rc):
                min_grid = 3
        def _pad8(v):
            return int(-(-int(v) // 8) * 8)

        if self.layout_kind == "column":
            def _first_build():
                # First build: probe capacities on a skin/2-jittered copy
                # of the positions — thermal equilibration moves bucket
                # occupancies well beyond the starting geometry (lattices
                # in particular give pathologically small occupancies) and
                # any later capacity growth recompiles the whole MD scan.
                # skin/2 is the principled bound: a rebuild fires before
                # any atom moves farther than that from the build geometry
                # (displacement check below), so per-atom jitter of
                # +-skin/2 covers the worst pre-rebuild occupancy shift
                # (full-skin jitter over-padded the edge buckets ~34% and
                # cost ~20% step time on the 10k bench).
                lay0 = build_column_layout(
                    R_build, rc, use_cell, use_pbc, edges=union_edges,
                    capacity_headroom=self.capacity_headroom,
                    min_grid=min_grid,
                )
                nx0, ny0, P0, ks0 = lay0.dims
                amp = self.skin * self.jitter_fraction
                jit = R_build + np.random.RandomState(0).uniform(
                    -amp, amp, R_build.shape
                )
                try:
                    lay1 = build_column_layout(
                        jit, rc, use_cell, use_pbc, dims=(nx0, ny0, 1),
                        capacity_headroom=self.capacity_headroom,
                    )
                    _, _, P1, ks1 = lay1.dims
                except CapacityError:
                    P1, ks1 = P0, ks0
                self._dims = (nx0, ny0, 1)
                # column capacity: the one-hot selection depth quantizes
                # at the 128-deep MXU — headroom must not push P across a
                # multiple of 128 (136 would cost two passes like 256)
                P_want = _pad8(max(P0, P1) + 8)
                if (P_want - 1) // 128 > (_pad8(max(P0, P1)) - 1) // 128:
                    P_want = _pad8(max(P0, P1))
                self._C = P_want
                hb = self.bucket_headroom
                self._K = tuple(
                    _pad8(max(a, b) + max(16, int(max(a, b) * hb)))
                    for a, b in zip(ks0, ks1)
                )

            if self._dims is None:
                _first_build()
            try:
                layout = build_column_layout(
                    R_build, rc, use_cell, use_pbc, capacity=self._C,
                    bucket_size=self._K, dims=self._dims,
                    edges=union_edges,
                    capacity_headroom=self.capacity_headroom,
                )
            except CapacityError:
                # sticky shapes no longer fit: grow them monotonically
                # (elementwise max with the fresh requirement + headroom)
                # so rebuilds never shrink shapes and ping-pong recompiles
                lay2 = build_column_layout(
                    R_build, rc, use_cell, use_pbc, dims=self._dims,
                    edges=union_edges,
                    capacity_headroom=self.capacity_headroom,
                )
                _, _, P2, ks2 = lay2.dims
                P_want = _pad8(P2 + 8)
                if (P_want - 1) // 128 > (_pad8(P2) - 1) // 128:
                    P_want = _pad8(P2)
                if (max(self._C, P_want) - 1) // 128 > (self._C - 1) // 128:
                    # growing the depth across a 128 multiple nearly
                    # doubles every selection dot (a 136-deep column
                    # costs two MXU passes like 256) — re-autotune the
                    # xy grid on the CURRENT (equilibrated) geometry
                    # instead: a finer grid keeps the depth in one pass
                    # at the same physics, for the same recompile the
                    # grow already pays (measured: the 10k bench's
                    # 128->136 grow was +39% step time vs +6% slots).
                    _first_build()
                else:
                    self._C = max(self._C, P_want)
                    self._K = tuple(
                        max(a, _pad8(b + max(16, int(
                            b * self.bucket_headroom))))
                        for a, b in zip(self._K, ks2)
                    )
                layout = build_column_layout(
                    R_build, rc, use_cell, use_pbc, capacity=self._C,
                    bucket_size=self._K, dims=self._dims,
                    edges=union_edges,
                    capacity_headroom=self.capacity_headroom,
                )
        else:
            if M != 1:
                raise NotImplementedError(
                    "the 27-cell layout supports a single molecule; use "
                    "layout='column' for batched molecules"
                )
            try:
                layout = build_cell_layout(
                    R_np, rc, use_cell, use_pbc, capacity=self._C,
                    n_neighbors=self._K, dims=self._dims,
                    capacity_headroom=self.capacity_headroom,
                    k_multiple=self.k_multiple,
                )
            except CapacityError:
                layout = build_cell_layout(
                    R_np, rc, use_cell, use_pbc,
                    capacity_headroom=self.capacity_headroom,
                    k_multiple=self.k_multiple,
                )
        if self.layout_kind == "column":
            nx, ny, P, ksizes = layout.dims
            self._dims = (nx, ny, 1)
            self._C, self._K = P, ksizes
        else:
            nx, ny, nz, C, K = layout.dims
            self._dims = (nx, ny, nz)
            self._C, self._K = C, K
        self._layout = layout

        # sorted-space static atom arrays
        Z = np.asarray(jax.device_get(system.atomic_numbers))
        idx_m = np.asarray(jax.device_get(system.idx_m))
        order = layout.order
        dtype = system.positions.dtype

        def _use_preoh_check(n_slots, P):
            if self.layout_kind != "column":
                return False
            if self.precompute_onehots is not None:
                return bool(self.precompute_onehots)
            # auto: 3 bf16 tables of [slots, P] under ~512 MB of HBM
            return 3 * n_slots * P * 2 <= 512 * 1024 * 1024

        self._use_preoh = _use_preoh_check
        if self.layout_kind == "column":
            nbl_state = {
                structure.cell_qcol: jnp.asarray(layout.qcol),
                structure.cell_dcol: jnp.asarray(layout.dcol),
                structure.cell_coff: jnp.asarray(layout.offcol, dtype),
                structure.cell_coff_fm: jnp.asarray(
                    np.moveaxis(layout.offcol, -1, 2), dtype
                ),
                structure.cell_emask: jnp.asarray(layout.emask, dtype),
                structure.cell_ksz: tuple(
                    jnp.zeros((k,), jnp.int8) for k in layout.ksizes
                ),
            }
            if self._use_preoh(layout.qcol.size, layout.dims[2]):
                from ..ops.colblock import build_onehots

                nbl_state[structure.cell_oh] = build_onehots(
                    nbl_state[structure.cell_qcol],
                    nbl_state[structure.cell_dcol],
                    layout.dims[2], tuple(layout.dims[3]),
                )
        else:
            nbl_state = {
                structure.cell_qidx: jnp.asarray(layout.qidx),
                structure.nbh_idx: jnp.asarray(layout.nbh_idx),
                structure.nbh_mask: jnp.asarray(layout.nbh_mask, dtype),
                structure.nbh_offsets: jnp.asarray(layout.nbh_offsets, dtype),
            }
        nbl_state.update({
            "cell_order": jnp.asarray(layout.order),
            "cell_rank": jnp.asarray(layout.rank),
            "cell_Z": jnp.asarray(Z[order] * (layout.slot_mask > 0)),
            "cell_idx_m": jnp.asarray(idx_m[order] * (layout.slot_mask > 0)),
            "cell_atom_mask": jnp.asarray(layout.slot_mask, dtype),
        })
        self._state = nbl_state
        self._build_positions = np.asarray(jax.device_get(system.positions)).copy()
        self._build_positions_dev = system.positions
        # ---- on-device rebuild eligibility (column layout only) ------
        self._host_build_positions_dev = system.positions
        self._dev_rebuild = None
        if self.layout_kind == "column":
            nx, ny, _ = self._dims
            heights = None
            if use_cell is not None and pbc[0].all():
                inv = np.linalg.inv(np.asarray(cell, np.float64))
                heights = 1.0 / np.linalg.norm(inv, axis=1)
            if (heights is not None and nx >= 3 and ny >= 3
                    and np.all(heights > 2 * rc)
                    and system.n_molecules == 1):
                self._dev_rebuild = {
                    "cell": jnp.asarray(cell, dtype),
                    "nx": nx, "ny": ny, "P": self._C,
                    "ks": tuple(self._K), "rc": rc,
                }
                # in-scan rebuild support: the scan carry holds the
                # positions of the last rebuild plus an overflow latch,
                # so the skin criterion is enforced EVERY STEP inside
                # the jitted chunk (a chunk-boundary-only check misses
                # edges whenever an atom crosses skin/2 mid-chunk)
                self._state["nbl_build_R"] = jnp.asarray(
                    system.positions, dtype)
                self._state["nbl_ovf"] = jnp.zeros((), bool)

    def retighten(self, system: System, jitter_fraction: Optional[float] = None,
                  bucket_headroom: Optional[float] = None) -> None:
        """Re-probe the layout capacities from the CURRENT positions,
        allowing the sticky shapes to SHRINK.

        The first build pads bucket capacities for the occupancy shift of
        thermal equilibration (jitter probe, ``build``); once the system
        IS equilibrated, the measured occupancies are representative and
        the padding can be retightened — every message/geometry kernel
        scales with the total edge-slot count, so 15-25% less padding is
        15-25% less kernel work.  Costs one recompile of the MD scan
        (shapes change); call it once after equilibration.  The
        grow-on-overflow path keeps correctness if occupancies later
        exceed the tightened capacities.
        """
        old = (self.jitter_fraction, self.bucket_headroom)
        self._dims = self._C = self._K = None
        self._layout = None
        self._state = None
        if jitter_fraction is not None:
            self.jitter_fraction = float(jitter_fraction)
        if bucket_headroom is not None:
            self.bucket_headroom = float(bucket_headroom)
        try:
            self.build(system)
        finally:
            self.jitter_fraction, self.bucket_headroom = old

    def displacement2(self, system: System):
        """Device-scalar max squared displacement since the last rebuild
        (fetched with the chunk logs in one round trip)."""
        if self._build_positions_dev is None:
            return None
        return _disp2(system.positions, self._build_positions_dev)

    def device_step_update(self, system: System, calc_state):
        """Traceable per-step rebuild check, called INSIDE the MD scan.

        When any atom has moved farther than skin/2 since the last
        rebuild, re-bin and rebuild the whole neighbor state on device
        under ``lax.cond`` (executed only on the steps that trigger).
        On capacity overflow the previous state is kept and a latch in
        the carry is set; the simulator's chunk-boundary sync sees the
        latch and falls back to the host builder (which grows the
        sticky capacities).  This removes the only correctness hole of
        chunk-level rebuilds: with a boundary-only check, an atom
        crossing skin/2 mid-chunk runs up to a whole chunk on missing
        edges (TPU redesign of reference md/neighborlist_md.py:100-189,
        which rebuilds on host every step).
        """
        info = self._dev_rebuild
        if (info is None or calc_state is None
                or "nbl_build_R" not in calc_state):
            return calc_state
        from ..ops.colblock_rebuild import rebin_and_rebuild

        thresh = jnp.asarray((self.skin / 2.0) ** 2,
                             system.positions.dtype)
        diff = system.positions - calc_state["nbl_build_R"]
        disp2 = jnp.max(jnp.sum(diff * diff, axis=-1))

        def rebuild(cs):
            new, ovf = rebin_and_rebuild(
                system.positions, cs["cell_order"], cs["cell_atom_mask"],
                cs["cell_Z"], cs["cell_idx_m"], info["cell"],
                nx=info["nx"], ny=info["ny"], P=info["P"],
                ksizes=info["ks"], rc=info["rc"],
            )
            dtype = system.positions.dtype
            upd = {
                structure.cell_qcol: new["qcol"],
                structure.cell_dcol: new["dcol"],
                structure.cell_coff: new["coff"].astype(dtype),
                structure.cell_coff_fm: new["coff_fm"].astype(dtype),
                structure.cell_emask: new["emask"].astype(dtype),
                "cell_order": new["order"].astype(cs["cell_order"].dtype),
                "cell_rank": new["rank"].astype(cs["cell_rank"].dtype),
                "cell_Z": new["Z"].astype(cs["cell_Z"].dtype),
                "cell_idx_m": new["idx_m"].astype(cs["cell_idx_m"].dtype),
                "cell_atom_mask": new["atom_mask"].astype(dtype),
                "nbl_build_R": jnp.asarray(system.positions, dtype),
            }
            if structure.cell_oh in cs:
                from ..ops.colblock import build_onehots

                upd[structure.cell_oh] = build_onehots(
                    new["qcol"], new["dcol"], info["P"],
                    tuple(info["ks"]))
            out = dict(cs)
            for k, v in upd.items():
                # overflow: keep the previous (still-valid-shape) state;
                # nbl_build_R stays old so the trigger re-fires, and the
                # latch makes the host grow capacities at the boundary
                out[k] = jax.tree.map(
                    lambda a, b: jnp.where(ovf, a, b), cs[k], v)
            out["nbl_ovf"] = cs["nbl_ovf"] | ovf
            return out

        return jax.lax.cond(disp2 > thresh, rebuild, lambda cs: cs,
                            calc_state)

    def maybe_rebuild(self, system: System, disp2=None) -> bool:
        if self._state is None:
            self.build(system)
            return True
        if isinstance(disp2, dict):
            disp2 = disp2["disp2"]
        if disp2 is None:
            R_np = np.asarray(jax.device_get(system.positions))
            disp2 = np.max(np.sum((R_np - self._build_positions) ** 2, axis=-1))
        if disp2 <= (self.skin / 2.0) ** 2:
            return False
        if self._dev_rebuild is not None and self._rebuild_on_device(system):
            return True
        self.build(system)
        return True

    def _rebuild_on_device(self, system: System) -> bool:
        """jit re-bin + rebuild of the whole sorted-space state on device;
        no position ever crosses to the host (only a scalar overflow
        flag).  Falls back to the host builder on capacity overflow."""
        from ..ops.colblock_rebuild import rebin_and_rebuild

        info = self._dev_rebuild
        st = self._state
        new, ovf = rebin_and_rebuild(
            system.positions, st["cell_order"], st["cell_atom_mask"],
            st["cell_Z"], st["cell_idx_m"], info["cell"],
            nx=info["nx"], ny=info["ny"], P=info["P"],
            ksizes=info["ks"], rc=info["rc"],
        )
        if bool(jax.device_get(ovf)):
            return False                       # capacity overflow: host path
        dtype = system.positions.dtype
        st = dict(st)
        st[structure.cell_qcol] = new["qcol"]
        st[structure.cell_dcol] = new["dcol"]
        st[structure.cell_coff] = new["coff"].astype(dtype)
        st[structure.cell_coff_fm] = new["coff_fm"].astype(dtype)
        st[structure.cell_emask] = new["emask"].astype(dtype)
        if structure.cell_oh in st:
            from ..ops.colblock import build_onehots

            st[structure.cell_oh] = build_onehots(
                new["qcol"], new["dcol"], info["P"], tuple(info["ks"]))
        st["cell_order"] = new["order"]
        st["cell_rank"] = new["rank"]
        st["cell_Z"] = new["Z"]
        st["cell_idx_m"] = new["idx_m"]
        st["cell_atom_mask"] = new["atom_mask"].astype(dtype)
        if "nbl_build_R" in st:
            st["nbl_build_R"] = jnp.asarray(system.positions, dtype)
            st["nbl_ovf"] = jnp.zeros((), bool)
        self._state = st
        self._build_positions_dev = system.positions
        return True

    def state(self) -> Dict[str, jax.Array]:
        return self._state


class AllPairsNeighborListMD:
    """Static all-pairs (same-molecule) index set + per-step device masking."""

    def __init__(self, cutoff: float, cutoff_shell: float = 0.0):
        # cutoff in the *model's* length unit is handled by the calculator;
        # here cutoff is in MD internal units.
        self.cutoff = float(cutoff)
        self.cutoff_shell = float(cutoff_shell)
        self._static: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def _static_pairs(self, idx_m: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        key = hash(idx_m.tobytes())
        if key not in self._static:
            same = idx_m[:, None] == idx_m[None, :]
            np.fill_diagonal(same, False)
            ii, jj = np.nonzero(same)
            order = np.lexsort((jj, ii))
            self._static[key] = (
                ii[order].astype(np.int32),
                jj[order].astype(np.int32),
            )
        return self._static[key]

    def get_neighbors_single(
        self,
        positions: jax.Array,  # [A, 3] one replica, MD units
        cells: jax.Array,      # [M, 3, 3]
        idx_m_np: np.ndarray,  # [A] static molecule ids
        idx_m: jax.Array,
        pbc: jax.Array,        # [M, 3]
    ) -> Dict[str, jax.Array]:
        """Pair inputs for one replica: idx_i, idx_j, offsets, pair_mask."""
        ii_np, jj_np = self._static_pairs(idx_m_np)
        idx_i = jnp.asarray(ii_np)
        idx_j = jnp.asarray(jj_np)

        Ri = jnp.take(positions, idx_i, axis=0)
        Rj = jnp.take(positions, idx_j, axis=0)
        diff = Rj - Ri

        pair_mol = jnp.take(idx_m, idx_i, axis=0)
        cell_pair = jnp.take(cells, pair_mol, axis=0)  # [P, 3, 3]
        det = jnp.abs(jnp.linalg.det(cell_pair))
        has_cell = det > 1e-12
        safe_cell = cell_pair + jnp.eye(3, dtype=positions.dtype)[None] * (
            ~has_cell[:, None, None]
        )
        inv = jnp.linalg.inv(safe_cell)
        frac = jnp.einsum("pj,pjk->pk", diff, inv)
        pbc_pair = jnp.take(pbc, pair_mol, axis=0)
        shift = jnp.where(pbc_pair & has_cell[:, None], -jnp.round(frac), 0.0)
        offsets = jnp.einsum("pk,pkj->pj", shift, safe_cell)

        d = jnp.linalg.norm(diff + offsets, axis=-1)
        mask = (d < (self.cutoff + self.cutoff_shell)).astype(positions.dtype)
        return {
            structure.idx_i: idx_i,
            structure.idx_j: idx_j,
            structure.offsets: offsets,
            structure.pair_mask: mask,
        }
