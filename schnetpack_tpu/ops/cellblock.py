"""Cell-blocked neighbor layout: the TPU answer to the gather wall.

Problem: the dense [A, K] layout evaluates ``x[nbh]`` as a row gather,
which on TPU is *latency-bound* at ~14 ns per gathered row regardless of
row width (measured, see PERF.md).  At 10k atoms / K=16 that is ~4 ms per
gather and there are ~12 gathers per force evaluation — the entire MD step
is spent waiting on gather descriptors.

Design (no reference counterpart — the torch reference scatters, cf.
``src/schnetpack/nn/scatter.py``): atoms are binned into a regular grid of
cells whose edge is >= the build cutoff, sorted cell-major, and padded to a
fixed per-cell capacity C.  Every neighbor of an atom in cell c then lives
in one of the 27 surrounding cells.  The neighbor gather becomes

1. **candidate tile**: E[c] = the 27 neighbor-cell tiles of c, materialised
   with 27 static ``jnp.roll``s (pure full-bandwidth copies, zero gather
   descriptors), giving E [n_cells, 27*C, D];
2. **selection**: a one-hot matrix ``sel`` [n_cells, C*K, 27*C] built once
   per neighbor-list rebuild picks each atom's K true neighbors out of the
   216 candidates as a *batched matmul* on the MXU:
   ``out = einsum('cpq,cqd->cpd', sel, E)``.

The contraction depth is 27*C (~216) so the MXU runs near full tiling, and
the FLOP count is tiny (A*K*27C*D*2 ~ tens of GFLOP).  With
``Precision.HIGH`` (bf16x3 passes) the selection is *exact* in float32:
one-hot entries are exactly representable in a single bf16 term, so the
dropped lo*lo cross term of bf16x3 is identically zero.

The backward pass is hand-written so the large cotangent [A, K, D] is read
exactly once (the naive autodiff of the 27-roll formulation reads it 27
times): H = einsum('cpq,cpd->cqd', sel, g) scatters the cotangent onto the
candidate axis in one matmul, then 27 reverse rolls fold H back onto the
table — no scatter instruction anywhere.

A Pallas kernel (``ops/cellblock_pallas.py``) implements the same
contract fused in VMEM; this module is the portable XLA formulation and
the numerical reference for it.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Offset enumeration shared by the builder, the XLA path and the Pallas
# kernel: o = ((dx+1)*3 + (dy+1))*3 + (dz+1), dx/dy/dz in {-1, 0, 1}.
# dz-minor ordering makes each xy-column's three z-tiles contiguous in the
# candidate axis, so the kernel assembles the candidate tile from 9
# contiguous 3C-row slices of halo-padded columns.
OFFSETS = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)

class CapacityError(ValueError):
    """Sticky layout capacities (cell/column/bucket) no longer fit."""


# matmul passes for the selection einsums: HIGH = 3x bf16 passes, which is
# exact for one-hot x float32 (see module docstring).
SELECTION_PRECISION = jax.lax.Precision.HIGH


# implementation override: None = auto (pallas on TPU, xla elsewhere);
# "xla" | "pallas" | "pallas_interpret"
IMPL: Optional[str] = None

# bf16 selection passes for the Pallas kernels: 1 -> bf16 features,
# 2 -> ~16-bit mantissa, 3 -> exact float32 (one-hot entries are exact in
# a single bf16 term).  The default is the exact-f32 setting so reduced
# precision is always an explicit opt-in: the MD calculator sets this
# per-run via its `precision` argument ("bf16" | "mixed" | "f32"), and
# SPK_TPU_PIECES overrides the default for scripts.
import os as _os

PIECES: int = int(_os.environ.get("SPK_TPU_PIECES", "3"))

# Fusion mode of the PaiNN column message kernels (pallas path only):
#   "hybrid" -> the per-edge geometry is computed ONCE per step by the
#               geometry kernel; the message forward AND backward kernels
#               read it from HBM (the backward derives its geometry chain
#               from the stored channels — see colblock_pallas geo-resident
#               backward).
#   "full"   -> geometry recomputed inside both message kernels (no geo
#               tensors exist at all; minimum HBM footprint).
# Measured at 10k atoms (PIECES=1): hybrid 10.5 ms/step device vs full
# 13.2 (fwd kernels 0.98 vs 1.46 ms, bwd 1.65 vs 2.14, geometry kernel
# 0.23 once) — the per-kernel geometry recompute costs more than the geo
# HBM reads.  Both paths are numerically identical (bit-exact forces).
FUSE: str = _os.environ.get("SPK_TPU_FUSE", "hybrid")

# Whether the column message BACKWARD kernels accumulate the filter-weight
# cotangent gFW.  Training needs it; MD/inference only differentiates wrt
# positions (through x/mu/R), and the gFW accumulation is a pure
# depth/width-128-padded matmul tax (~25 GFLOP padded per interaction at
# the 10k-atom bench, ~11% of the backward kernel).  MD calculators set
# this to False before tracing their step functions.
WGRAD: bool = _os.environ.get("SPK_TPU_WGRAD", "1") != "0"


def _impl() -> str:
    if IMPL is not None:
        return IMPL
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _candidate_tiles(table: jax.Array, nx: int, ny: int, nz: int, C: int) -> jax.Array:
    """E [nx, ny, nz, 27*C, D]: the 27 neighbor-cell tiles of every cell,
    assembled from static periodic rolls (full-bandwidth copies)."""
    D = table.shape[-1]
    tiles = table.reshape(nx, ny, nz, C, D)
    parts = [
        jnp.roll(tiles, (-int(dx), -int(dy), -int(dz)), axis=(0, 1, 2))
        for dx, dy, dz in OFFSETS
    ]
    return jnp.concatenate(parts, axis=3)


def _onehot(qidx: jax.Array, dtype) -> jax.Array:
    nx, ny, nz, C, K = qidx.shape
    q = qidx.reshape(nx, ny, nz, C * K)
    iota = jnp.arange(27 * C, dtype=qidx.dtype)
    return (q[..., None] == iota).astype(dtype)


@jax.custom_vjp
def cell_gather(table: jax.Array, qidx: jax.Array) -> jax.Array:
    """Gather neighbor rows of a cell-sorted table.

    Args:
        table: [A', D] cell-sorted feature table, A' = nx*ny*nz*C.
        qidx: [nx, ny, nz, C, K] int32 candidate index o*C + s per edge
            (-1 for padded edges/slots; see OFFSETS for the o enumeration).

    Returns:
        [A', K, D] gathered rows (zeros where qidx is -1).
    """
    return _cell_gather_fwd_impl(table, qidx)


def _cell_gather_fwd_impl(table, qidx):
    impl = _impl()
    if impl.startswith("pallas"):
        from .cellblock_pallas import cell_gather_fwd_pallas

        return cell_gather_fwd_pallas(
            table, qidx, pieces=PIECES, interpret=impl == "pallas_interpret"
        )
    nx, ny, nz, C, K = qidx.shape
    D = table.shape[-1]
    E = _candidate_tiles(table, nx, ny, nz, C)
    sel = _onehot(qidx, table.dtype)
    out = jnp.einsum(
        "xyzpq,xyzqd->xyzpd", sel, E, precision=SELECTION_PRECISION
    )
    return out.reshape(nx * ny * nz * C, K, D)


def _cell_gather_fwd(table, qidx):
    return _cell_gather_fwd_impl(table, qidx), (qidx, table.shape)


def _cell_gather_bwd(res, g):
    qidx, table_shape = res
    impl = _impl()
    if impl.startswith("pallas"):
        from .cellblock_pallas import cell_gather_bwd_pallas

        dT = cell_gather_bwd_pallas(
            g, qidx, pieces=PIECES, interpret=impl == "pallas_interpret"
        )
        return dT.reshape(table_shape), None
    nx, ny, nz, C, K = qidx.shape
    D = g.shape[-1]
    g2 = g.reshape(nx, ny, nz, C * K, D)
    sel = _onehot(qidx, g.dtype)
    # one-matmul fold of the cotangent onto the candidate axis
    H = jnp.einsum("xyzpq,xyzpd->xyzqd", sel, g2, precision=SELECTION_PRECISION)
    H = H.reshape(nx, ny, nz, 27, C, D)
    dT = jnp.zeros((nx, ny, nz, C, D), H.dtype)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        dT = dT + jnp.roll(H[:, :, :, o], (int(dx), int(dy), int(dz)), axis=(0, 1, 2))
    return dT.reshape(table_shape), None


cell_gather.defvjp(_cell_gather_fwd, _cell_gather_bwd)


def selection_from_qidx(qidx: np.ndarray, dtype=np.float32) -> np.ndarray:
    """One-hot selection [nx, ny, nz, C*K, 27*C] from candidate indices.

    ``qidx`` [nx, ny, nz, C, K] holds o*C + s per edge (-1 for padding).
    """
    nx, ny, nz, C, K = qidx.shape
    q = qidx.reshape(nx, ny, nz, C * K)
    sel = q[..., None] == np.arange(27 * C, dtype=qidx.dtype)
    return sel.astype(dtype)


class CellLayout:
    """Host-built cell-blocked neighbor layout (numpy arrays).

    Attributes (A' = nx*ny*nz*C padded atom count, A = real atoms):
        dims: (nx, ny, nz, C, K)
        order: [A'] original atom index per sorted slot (0 for pads)
        rank: [A] sorted slot of each original atom
        slot_mask: [A'] 1.0 for real atoms
        qidx: [nx, ny, nz, C, K] candidate index o*C+s (-1 pad)
        sel: [nx, ny, nz, C*K, 27*C] float32 one-hot
        nbh_idx: [A', K] sorted-space neighbor index (0 pad)
        nbh_mask: [A', K]
        nbh_offsets: [A', K, 3] Cartesian periodic offsets
    """

    __slots__ = (
        "dims", "order", "rank", "slot_mask", "qidx",
        "nbh_idx", "nbh_mask", "nbh_offsets",
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    @property
    def sel(self) -> np.ndarray:
        """One-hot selection (built on demand; large at MD scales)."""
        return selection_from_qidx(self.qidx)


def _grid_dims(
    R: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray],
    pbc: Optional[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Grid dimensions + fractional-coordinate transform.

    Returns (n [3], origin [3], basis [3,3], periodic [3]) such that
    fractional coords are (R - origin) @ inv(basis) in [0, 1) per axis and
    bins = floor(frac * n).  Guarantees each cell's perpendicular height
    >= cutoff so that all neighbors within cutoff live in the 27-cell
    stencil.
    """
    if pbc is None:
        pbc = np.zeros(3, bool)
    pbc = np.asarray(pbc, bool)
    if cell is None or not np.abs(cell).sum() > 0:
        cell = np.eye(3)
        pbc = np.zeros(3, bool)
    cell = np.asarray(cell, np.float64)

    if pbc.any():
        basis = cell.copy()
        origin = np.zeros(3)
        # perpendicular heights of the box
        inv = np.linalg.inv(basis)
        heights = 1.0 / np.linalg.norm(inv, axis=1)  # h_k of row-vector cell
    else:
        basis = np.eye(3)
        origin = np.zeros(3)
        heights = np.zeros(3)

    lo = R.min(axis=0) - 1e-6
    hi = R.max(axis=0) + 1e-6
    n = np.ones(3, np.int64)
    for k in range(3):
        if pbc[k]:
            n[k] = max(1, int(np.floor(heights[k] / cutoff)))
        else:
            extent = max(hi[k] - lo[k], 1e-3)
            n[k] = max(1, int(np.floor(extent / cutoff)))
            basis[k] = 0.0
            basis[k, k] = extent
            origin[k] = lo[k]
    # non-periodic axes of a periodic cell: rebuild basis row from bbox
    if pbc.any() and not pbc.all():
        for k in range(3):
            if not pbc[k]:
                basis[k] = 0.0
                basis[k, k] = max(hi[k] - lo[k], 1e-3)
                origin[k] = lo[k]
    return n, origin, basis, pbc


def _autotune_grid(
    R: np.ndarray,
    origin: np.ndarray,
    basis: np.ndarray,
    pbc_arr: np.ndarray,
    n_max: np.ndarray,
) -> np.ndarray:
    """Pick grid dims minimising selection cost ~ n_cells * C^2.

    ``n_max`` (from the cutoff constraint) is the finest admissible grid;
    coarser grids trade more candidates per cell for less per-cell padding
    (crystals in particular produce highly uneven fine-grid occupancies).
    """
    frac = (R - origin) @ np.linalg.inv(basis)
    frac = np.where(pbc_arr, frac - np.floor(frac), np.clip(frac, 0.0, 1.0 - 1e-9))
    best, best_cost = n_max, None
    for g in (1.0, 1.2, 1.4, 1.6, 1.9):
        n = np.maximum(1, (n_max / g).astype(np.int64))
        bins = np.minimum((frac * n).astype(np.int64), n - 1)
        cid = (bins[:, 0] * n[1] + bins[:, 1]) * n[2] + bins[:, 2]
        occ = int(np.bincount(cid).max(initial=1))
        C = -(-(occ + 1) // 8) * 8  # kernel capacity (8-aligned)
        cost = float(np.prod(n)) * C * C
        if best_cost is None or cost < best_cost * 0.95:
            best, best_cost = n, cost
    return best


def build_cell_layout(
    R: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray] = None,
    pbc: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    n_neighbors: Optional[int] = None,
    capacity_headroom: int = 1,
    k_multiple: int = 2,
    dims: Optional[Tuple[int, int, int]] = None,
    edges: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> CellLayout:
    """Bin atoms, sort cell-major, and encode the neighbor list as
    cell-local candidate indices.

    ``cutoff`` is the *build* cutoff (model cutoff + skin).  ``capacity`` /
    ``n_neighbors`` fix C/K (for shape stability across MD rebuilds);
    ``dims`` pins the grid.  ``edges`` optionally supplies a precomputed
    (idx_i, idx_j, S) pair list.
    """
    R = np.asarray(R, np.float64)
    A = len(R)
    n, origin, basis, pbc_arr = _grid_dims(R, cutoff, cell, pbc)
    if dims is not None:
        n = np.asarray(dims, np.int64)
    else:
        n = _autotune_grid(R, origin, basis, pbc_arr, n)
    nx, ny, nz = (int(v) for v in n)

    frac_raw = (R - origin) @ np.linalg.inv(basis)
    # wrap periodic axes; clamp non-periodic (they are in [0,1) already)
    wrap = np.where(pbc_arr, np.floor(frac_raw), 0.0)
    frac = np.where(
        pbc_arr, frac_raw - wrap, np.clip(frac_raw, 0.0, 1.0 - 1e-9)
    )
    bins = np.minimum((frac * n).astype(np.int64), n - 1)
    # raw (unwrapped) bins: consistent with the pair list's S convention,
    # which is defined relative to the raw positions
    bins_raw = bins + wrap.astype(np.int64) * n
    cell_id = (bins[:, 0] * ny + bins[:, 1]) * nz + bins[:, 2]
    n_cells = nx * ny * nz

    counts = np.bincount(cell_id, minlength=n_cells)
    # capacity rounds up to a multiple of 8: the Pallas kernels slice the
    # halo'd columns at z*C row offsets, which Mosaic requires to be
    # sublane-aligned (multiples of 8)
    C = -(-(int(counts.max(initial=1)) + capacity_headroom) // 8) * 8
    if capacity is not None:
        if capacity < counts.max(initial=1):
            raise CapacityError(
                f"cell capacity {capacity} < max occupancy {counts.max()}"
            )
        C = capacity

    order_real = np.argsort(cell_id, kind="stable")
    starts = np.zeros(n_cells + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(A) - starts[cell_id[order_real]]  # slot within cell, sorted order
    # sorted slot of each real atom
    rank = np.empty(A, np.int64)
    rank[order_real] = cell_id[order_real] * C + slot
    Ap = n_cells * C
    order = np.zeros(Ap, np.int64)
    slot_mask = np.zeros(Ap, np.float32)
    order[rank] = np.arange(A)
    slot_mask[rank] = 1.0

    # ---- neighbor list (build cutoff) --------------------------------
    if edges is None:
        from ..transform.neighborlist import cell_list_neighbor_list

        use_cell = cell if (pbc_arr.any() and cell is not None) else None
        ii, jj, S = cell_list_neighbor_list(
            R, cutoff, use_cell, pbc_arr if pbc_arr.any() else None
        )
    else:
        ii, jj, S = edges
    S = np.asarray(S, np.int64)
    if cell is not None and np.abs(np.asarray(cell)).sum() > 0:
        off = S.astype(np.float64) @ np.asarray(cell, np.float64)
    else:
        off = np.zeros((len(ii), 3))

    # offset (in cells) of j's image relative to i.  On axes with >= 3
    # cells it must be in {-1, 0, 1}; on tiny periodic grids (n_k <= 2)
    # offsets alias modulo n_k and any representative with the same wrapped
    # destination cell is equivalent for gathering — the Cartesian offset
    # is carried per-edge so images stay exact.
    d_bins = bins_raw[jj] + S * n[None, :] - bins_raw[ii]
    for k in range(3):
        if n[k] >= 3:
            if len(ii) and np.abs(d_bins[:, k]).max() > 1:
                raise ValueError(
                    "neighbor outside the 27-cell stencil: cell edge < build "
                    f"cutoff (axis {k}, max bin delta {np.abs(d_bins[:, k]).max()})"
                )
        else:
            d_bins[:, k] = np.mod(d_bins[:, k], n[k])  # -> {0} or {0, 1}
    o_index = ((d_bins[:, 0] + 1) * 3 + (d_bins[:, 1] + 1)) * 3 + (d_bins[:, 2] + 1)
    s_j = rank[jj] % C
    q = o_index * C + s_j

    i_sorted = rank[ii]
    cnt_i = np.bincount(i_sorted, minlength=Ap)
    max_k = int(cnt_i.max(initial=1))
    K = int(-(-max_k // k_multiple) * k_multiple)
    if n_neighbors is not None:
        if n_neighbors < max_k:
            raise ValueError(f"n_neighbors {n_neighbors} < max degree {max_k}")
        K = n_neighbors

    edge_order = np.argsort(i_sorted, kind="stable")
    i_s = i_sorted[edge_order]
    e_starts = np.zeros(Ap + 1, np.int64)
    np.cumsum(cnt_i, out=e_starts[1:])
    k_slot = np.arange(len(i_s)) - e_starts[i_s]

    qidx = np.full((Ap, K), -1, np.int32)
    nbh_idx = np.zeros((Ap, K), np.int32)
    nbh_mask = np.zeros((Ap, K), np.float32)
    nbh_offsets = np.zeros((Ap, K, 3), np.float64)
    qidx[i_s, k_slot] = q[edge_order]
    nbh_idx[i_s, k_slot] = rank[jj][edge_order]
    nbh_mask[i_s, k_slot] = 1.0
    nbh_offsets[i_s, k_slot] = off[edge_order]

    qidx = qidx.reshape(nx, ny, nz, C, K)
    return CellLayout(
        dims=(nx, ny, nz, C, K),
        order=order.astype(np.int32),
        rank=rank.astype(np.int32),
        slot_mask=slot_mask,
        qidx=qidx,
        nbh_idx=nbh_idx,
        nbh_mask=nbh_mask,
        nbh_offsets=nbh_offsets,
    )


class ColumnLayout:
    """Column-bucketed edge layout (numpy arrays) — the fast-kernel format.

    Every edge is assigned to its *destination* xy-column (x, y) and the
    bucket c9 = (dx+1)*3 + (dy+1) of its source column offset.  Within a
    bucket, the edge's source is addressed simply by its row in the
    source column (atoms are packed per xy-column with static capacity P,
    z-sorted inside).  The neighbor gather then runs as 9 MXU one-hot
    dots per column against *resident* whole columns — no z binning, no
    z-halos, no per-z candidate-tile assembly at all (cf. the 27-cell
    per-z scheme of :func:`build_cell_layout`, which this supersedes on
    TPU); periodic z images are exact because every edge carries its
    Cartesian offset.

    Bucket occupancies are wildly uneven (the c9 = 4 center bucket holds
    all intra-column edges), so buckets are *ragged*: bucket c9 has its
    own static capacity ksizes[c9] (multiple of 8) and all per-edge
    arrays are packed along one edge axis of length Ktot = sum(ksizes);
    bucket c9 occupies rows [koffs[c9], koffs[c9] + ksizes[c9]).

    Attributes:
        dims: (nx, ny, P, ksizes: tuple of 9 ints — or 9*nb with
            z-blocked buckets, blk-major: bucket index b = blk*9 + c9)
        order/rank/slot_mask: as in :class:`CellLayout` (slot = col*P + r)
        qcol:  [nx, ny, Ktot] int32 in-column row of the source (-1 pad)
        dcol:  [nx, ny, Ktot] int32 in-column row of the destination (-1 pad)
        icol/jcol: [nx, ny, Ktot] int32 global sorted indices (0 pad)
        offcol: [nx, ny, Ktot, 3] float Cartesian periodic offsets
        emask: [nx, ny, Ktot] float32 1.0 for real edges
        nb: dest-z blocks per column (1 = unblocked)
        wins: per-bucket static circular source-row windows
            tuple of (w0, S) — all sources of bucket b satisfy
            (src - w0) mod P < S; None when nb == 1
    """

    __slots__ = (
        "dims", "order", "rank", "slot_mask",
        "qcol", "dcol", "icol", "jcol", "offcol", "emask",
        "nb", "wins",
    )

    def __init__(self, **kw):
        kw.setdefault("nb", 1)
        kw.setdefault("wins", None)
        for k in self.__slots__:
            setattr(self, k, kw[k])

    @property
    def ksizes(self):
        return self.dims[3]

    @property
    def column_capacity(self):
        return self.dims[2]


def _circular_window(rows: np.ndarray, P: int, margin: int) -> Tuple[int, int]:
    """Minimal 8-aligned circular window [w0, w0+S) mod P covering
    ``rows`` (unique in [0, P)), widened by ``margin`` on both sides."""
    if len(rows) == 0:
        return 0, 8
    u = np.unique(rows)
    if len(u) == 1:
        w0, span = int(u[0]), 1
    else:
        gaps = np.diff(np.concatenate([u, [u[0] + P]]))
        g = int(np.argmax(gaps))
        w0 = int(u[(g + 1) % len(u)])
        span = P - int(gaps[g])
    w0 = w0 - margin
    span = span + 2 * margin
    w0a = (w0 % P) // 8 * 8
    S = int(-(-(span + (w0 % P) - w0a) // 8) * 8)
    if S >= P:
        return 0, P
    return w0a, S


def build_column_layout(
    R: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray] = None,
    pbc: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    bucket_size: Optional[int] = None,
    capacity_headroom: int = 1,
    dims: Optional[Tuple[int, int, int]] = None,
    edges: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    min_grid: int = 1,
    dest_block: Optional[int] = None,
    windows: Optional[Tuple[Tuple[int, int], ...]] = None,
    window_margin: int = 8,
) -> ColumnLayout:
    """Bin atoms cell-major and bucket edges by (destination column, c9).

    Same binning/sorting as :func:`build_cell_layout`; ``bucket_size``
    pins Kcol for shape stability across MD rebuilds.

    With ``dest_block`` = D (multiple of 8), every (column, c9) bucket is
    further split by the destination row's z-block ``dcol // D`` into
    nb = P/D blocked buckets (blk-major bucket index b = blk*9 + c9), and
    a static circular source-row window (w0, S) is measured per bucket:
    columns are z-sorted, so the sources of a z-block's edges cluster in
    a narrow row band.  The fused kernels then contract one-hots at depth
    S (~D + 2*cutoff_rows) instead of the full column depth P, and fold
    destinations at depth D — the dominant FLOP term of the whole MD step
    drops by ~P/S.  ``windows`` pins the per-bucket windows for shape/
    program stability across MD rebuilds (CapacityError when they no
    longer cover, like ``bucket_size``).
    """
    R = np.asarray(R, np.float64)
    A = len(R)
    n_max, origin, basis, pbc_arr = _grid_dims(R, cutoff, cell, pbc)

    frac_raw = (R - origin) @ np.linalg.inv(basis)
    wrap = np.where(pbc_arr, np.floor(frac_raw), 0.0)
    frac = np.where(
        pbc_arr, frac_raw - wrap, np.clip(frac_raw, 0.0, 1.0 - 1e-9)
    )

    # edges first — they are grid-independent and drive the grid autotune
    if edges is None:
        from ..transform.neighborlist import cell_list_neighbor_list

        use_cell = cell if (pbc_arr.any() and cell is not None) else None
        ii, jj, S = cell_list_neighbor_list(
            R, cutoff, use_cell, pbc_arr if pbc_arr.any() else None
        )
    else:
        ii, jj, S = edges
    S = np.asarray(S, np.int64)
    if cell is not None and np.abs(np.asarray(cell)).sum() > 0:
        off = S.astype(np.float64) @ np.asarray(cell, np.float64)
    else:
        off = np.zeros((len(ii), 3))

    def _grid_stats(n):
        """(P, ksizes, Ktot) for a candidate xy grid (ragged-pad aware)."""
        nx, ny = int(n[0]), int(n[1])
        bins = np.minimum((frac[:, :2] * [nx, ny]).astype(np.int64),
                          [nx - 1, ny - 1])
        bins_raw = bins + wrap[:, :2].astype(np.int64) * [nx, ny]
        col_id = bins[:, 0] * ny + bins[:, 1]
        occ = np.bincount(col_id, minlength=nx * ny)
        P = -(-(int(occ.max(initial=1)) + capacity_headroom) // 8) * 8
        d2 = bins_raw[jj] + S[:, :2] * [nx, ny] - bins_raw[ii]
        for k in range(2):
            if n[k] >= 3:
                if len(ii) and np.abs(d2[:, k]).max() > 1:
                    return None
            else:
                d2[:, k] = np.mod(d2[:, k], n[k])
        c9 = (d2[:, 0] + 1) * 3 + (d2[:, 1] + 1)
        bucket = col_id[ii] * 9 + c9
        bcnt = np.bincount(bucket, minlength=nx * ny * 9).reshape(-1, 9)
        ks = tuple(int(-(-max(int(bcnt[:, b].max(initial=0)), 1) // 8) * 8)
                   for b in range(9))
        return P, ks, int(sum(ks))

    if dims is not None:
        n = np.asarray(dims, np.int64)
    else:
        # autotune the xy grid: padded kernel cost ~ columns*Ktot*P_eff
        # (selection dots over real+padded edge rows at depth P), plus a
        # small weight on total atom slots (atomwise table ops).
        # P_eff quantizes the depth at the MXU's 128 lanes: the one-hot
        # operand [K, P] pads P to a multiple of 128 per pass, so P=104
        # and P=128 cost the same dot while P=136 costs two passes —
        # grids whose depth just crosses a multiple of 128 are charged
        # for the full extra pass (measured +39% step time on the 10k
        # bench when a capacity grow crossed 128 -> 136)
        # min_grid: callers that rebuild the edge state on device need an
        # alias-free stencil (nx, ny >= 3); only enforced when admissible —
        # the unconstrained pass is the fallback when no such grid exists
        lo = min_grid if n_max[0] >= min_grid and n_max[1] >= min_grid else 1
        best = None
        for floor_g in dict.fromkeys((lo, 1)):
            best_cost = None
            stale = 0
            for g in range(int(max(n_max[0], n_max[1])), 0, -1):
                cand = np.minimum(n_max, [g, g, 1])
                if cand[0] < floor_g or cand[1] < floor_g:
                    continue
                st = _grid_stats(cand)
                if st is None:
                    continue
                P_c, _, Ktot_c = st
                ncol = int(cand[0]) * int(cand[1])
                P_eff = -(-P_c // 128) * 128
                cost = ncol * Ktot_c * P_eff + 50 * ncol * P_c
                if best_cost is None or cost < best_cost * 0.98:
                    best, best_cost = cand, cost
                    stale = 0
                else:
                    # cost is ~U-shaped in the grid size: once it stops
                    # improving for a few candidates, coarser grids only
                    # get worse — stop re-binning all atoms and edges per
                    # candidate (O(g_max * (A+E)) host time otherwise)
                    stale += 1
                    if stale >= 4:
                        break
                if ncol == 1:
                    break
            if best is not None:
                break
        n = best
    n = np.array([int(n[0]), int(n[1]), 1], np.int64)
    nx, ny, nz = (int(v) for v in n)

    bins = np.minimum((frac * n).astype(np.int64), n - 1)
    bins_raw = bins + wrap.astype(np.int64) * n
    col_id = bins[:, 0] * ny + bins[:, 1]
    n_cols = nx * ny

    # per-xy-column capacity P: the kernels contract one-hots over whole
    # resident columns, so only the xy grid is constrained (edge >= cutoff
    # for the 9-stencil) — the z direction needs no binning at all
    counts = np.bincount(col_id, minlength=n_cols)
    P = -(-(int(counts.max(initial=1)) + capacity_headroom) // 8) * 8
    if capacity is not None:
        if capacity < counts.max(initial=1):
            raise CapacityError(
                f"column capacity {capacity} < max occupancy {counts.max()}"
            )
        P = capacity

    # sort atoms by (column, z) — z-order inside a column is free but keeps
    # memory access local
    order_real = np.lexsort((frac[:, 2], col_id))
    starts = np.zeros(n_cols + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(A) - starts[col_id[order_real]]
    rank = np.empty(A, np.int64)
    rank[order_real] = col_id[order_real] * P + slot
    Ap = n_cols * P
    order = np.zeros(Ap, np.int64)
    slot_mask = np.zeros(Ap, np.float32)
    order[rank] = np.arange(A)
    slot_mask[rank] = 1.0

    d_bins = bins_raw[jj] + S * n[None, :] - bins_raw[ii]
    for k in range(2):
        if n[k] >= 3:
            if len(ii) and np.abs(d_bins[:, k]).max() > 1:
                raise ValueError(
                    "neighbor outside the 9-column stencil: xy cell edge < "
                    f"build cutoff (axis {k})"
                )
        else:
            d_bins[:, k] = np.mod(d_bins[:, k], n[k])

    r_i = rank[ii]
    col_i = r_i // P
    c9 = (d_bins[:, 0] + 1) * 3 + (d_bins[:, 1] + 1)
    src = rank[jj] % P                    # row of j within its column
    dst = r_i % P                         # row of i within its column

    bucket = col_i * 9 + c9
    n_buckets = nx * ny * 9
    bcnt = np.bincount(bucket, minlength=n_buckets).reshape(nx * ny, 9)
    # ragged static capacities: per-c9 max over columns, 8-aligned
    ksizes = tuple(
        int(-(-max(int(bcnt[:, b].max(initial=0)), 1) // 8) * 8)
        for b in range(9)
    )
    if bucket_size is not None:
        want = tuple(bucket_size)
        if any(w < int(bcnt[:, b].max(initial=0)) for b, w in enumerate(want)):
            raise CapacityError(
                f"bucket sizes {want} < max occupancies "
                f"{tuple(int(v) for v in bcnt.max(axis=0))}"
            )
        ksizes = want
    koffs = np.concatenate([[0], np.cumsum(ksizes)])
    Ktot = int(koffs[-1])

    e_order = np.argsort(bucket, kind="stable")
    b_s = bucket[e_order]
    b_starts = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(bcnt.reshape(-1), out=b_starts[1:])
    k_slot = np.arange(len(b_s)) - b_starts[b_s]
    # packed row: column-major block of Ktot rows, bucket c9 at koffs[c9]
    row = (b_s // 9) * Ktot + koffs[b_s % 9] + k_slot

    qcol = np.full((nx * ny, Ktot), -1, np.int32).reshape(-1)
    dcol = np.full((nx * ny, Ktot), -1, np.int32).reshape(-1)
    icol = np.zeros(nx * ny * Ktot, np.int32)
    jcol = np.zeros(nx * ny * Ktot, np.int32)
    offcol = np.zeros((nx * ny * Ktot, 3), np.float64)
    emask = np.zeros(nx * ny * Ktot, np.float32)
    qcol[row] = src[e_order]
    dcol[row] = dst[e_order]
    icol[row] = r_i[e_order]
    jcol[row] = rank[jj][e_order]
    offcol[row] = off[e_order]
    emask[row] = 1.0

    shp = (nx, ny, Ktot)
    return ColumnLayout(
        dims=(nx, ny, P, ksizes),
        order=order.astype(np.int32),
        rank=rank.astype(np.int32),
        slot_mask=slot_mask,
        qcol=qcol.reshape(shp),
        dcol=dcol.reshape(shp),
        icol=icol.reshape(shp),
        jcol=jcol.reshape(shp),
        offcol=offcol.reshape(shp + (3,)),
        emask=emask.reshape(shp),
    )


# ---- permutation with scatter-free VJP --------------------------------

@jax.custom_vjp
def permute_rows(x: jax.Array, fwd_idx: jax.Array, inv_idx: jax.Array) -> jax.Array:
    """y = x[fwd_idx] with the VJP computed as a *gather* over inv_idx
    (valid because fwd/inv are mutually inverse injections; rows of x not
    referenced by fwd_idx receive zero cotangent via the mask)."""
    return jnp.take(x, fwd_idx, axis=0)


def _permute_fwd(x, fwd_idx, inv_idx):
    return jnp.take(x, fwd_idx, axis=0), (inv_idx, x.shape)


def _permute_bwd(res, g):
    inv_idx, x_shape = res
    dx = jnp.take(g, jnp.abs(inv_idx), axis=0)
    valid = (inv_idx >= 0).reshape((-1,) + (1,) * (g.ndim - 1))
    return dx * valid.astype(g.dtype), None, None


permute_rows.defvjp(_permute_fwd, _permute_bwd)
