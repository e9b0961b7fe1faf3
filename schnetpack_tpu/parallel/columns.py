"""User-facing slab-sharded (spatial-decomposition) evaluation.

Shards the column-bucket layout (ops/cellblock.build_column_layout) over a
1-D device mesh: each device owns nx/n contiguous x-slabs of xy-columns
and the column kernels exchange only boundary column planes via ppermute
(ops/colblock_shard.py).  This replaces the round-1 GSPMD annotation
approach (which all-gathered the whole feature table per block) with a
real halo-exchange decomposition: per-device memory and interconnect
traffic are O(A/n + halo).

Typical use::

    lay = build_column_layout(R, cutoff, cell, pbc, dims=(nx, ny, 1))
    mesh = make_column_mesh(n_devices)
    eval_fn = make_sharded_column_eval(pot, params, lay, mesh)
    energy, forces = eval_fn(inputs)        # inputs from column_inputs()

``nx`` must be a multiple of the device count (pass ``dims`` to the
builder to pin it).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from .. import properties as P
from ..ops.colblock_shard import COLS_AXIS, COLS_AXIS_Y

#: keys carrying per-column / per-atom-slot data (sharded in space)
_ATOM_KEYS = (P.R, P.Z, P.idx_m, P.atom_mask)
_COL_KEYS = (P.cell_qcol, P.cell_dcol, P.cell_coff, P.cell_emask)


def make_column_mesh(n_devices: int, dims=None) -> Mesh:
    """1-D x-slab mesh, or a 2-D ``dims=(px, py)`` (x, y)-block mesh.

    2-D block decomposition lets meshes larger than nx shard (VERDICT r3
    #7): nx must be a multiple of px and ny a multiple of py."""
    if dims is None:
        return Mesh(np.array(jax.devices()[:n_devices]), (COLS_AXIS,))
    px, py = dims
    devs = np.array(jax.devices()[:px * py]).reshape(px, py)
    return Mesh(devs, (COLS_AXIS, COLS_AXIS_Y))


def _mesh_is_2d(mesh: Mesh) -> bool:
    return COLS_AXIS_Y in mesh.axis_names


def column_inputs(lay, R: np.ndarray, Z: np.ndarray, dtype=jnp.float32,
                  sharded: bool = True, mesh_2d: bool = False
                  ) -> Dict[str, jax.Array]:
    """Model inputs in sorted column space (global arrays, shard-ready).

    With ``mesh_2d`` the per-atom arrays come out column-shaped
    [nx, ny, P, ...] so both leading axes can shard (a flat [A] layout is
    x-major and cannot block-shard over y); the shard_map body flattens
    them back to the model's [A_loc] view per device."""
    Ap = len(lay.order)
    order = lay.order
    nx, ny, _ = lay.qcol.shape
    Pcap = Ap // (nx * ny)
    R_s = jnp.asarray(R[order] * (lay.slot_mask[:, None] > 0), dtype)
    Z_s = jnp.asarray(Z[order] * (lay.slot_mask > 0).astype(np.int64))
    m_s = jnp.asarray(lay.slot_mask, dtype)
    i_s = jnp.zeros(Ap, jnp.int32)
    if mesh_2d:
        R_s = R_s.reshape(nx, ny, Pcap, 3)
        Z_s = Z_s.reshape(nx, ny, Pcap)
        m_s = m_s.reshape(nx, ny, Pcap)
        i_s = i_s.reshape(nx, ny, Pcap)
    inputs = {
        P.R: R_s,
        P.Z: Z_s,
        P.idx_m: i_s,
        P.atom_mask: m_s,
        P.n_atoms: jnp.asarray([Ap], jnp.int32),
        P.cell_qcol: jnp.asarray(lay.qcol),
        P.cell_dcol: jnp.asarray(lay.dcol),
        P.cell_coff: jnp.asarray(lay.offcol, dtype),
        P.cell_emask: jnp.asarray(lay.emask, dtype),
        P.cell_ksz: tuple(jnp.zeros((k,), jnp.int8) for k in lay.ksizes),
        P.idx_i: jnp.zeros(1, jnp.int32),
        P.idx_j: jnp.zeros(1, jnp.int32),
        P.offsets: jnp.full((1, 3), 1e3, dtype),
        P.pair_mask: jnp.zeros(1, dtype),
    }
    if sharded:
        inputs[P.cell_shard] = jnp.zeros(2 if mesh_2d else 1, jnp.int8)
    return inputs


def column_in_specs(inputs) -> Dict[str, PartitionSpec]:
    """shard_map in_specs: column/atom arrays slab- or block-sharded."""
    two_d = (P.cell_shard in inputs
             and inputs[P.cell_shard].shape[0] >= 2)
    sharded = set(_ATOM_KEYS) | set(_COL_KEYS)
    pspec = (PartitionSpec(COLS_AXIS, COLS_AXIS_Y) if two_d
             else PartitionSpec(COLS_AXIS))

    def spec(k, v):
        if isinstance(v, tuple):
            return tuple(PartitionSpec() for _ in v)
        return pspec if k in sharded else PartitionSpec()

    return {k: spec(k, v) for k, v in inputs.items()}


def _flatten_atoms(ins: Dict) -> Dict:
    """Local shard_map view: [nxl, nyl, P, ...] atom arrays -> flat [A_loc]."""
    if ins[P.R].ndim == 2:
        return ins
    out = dict(ins)
    nxl, nyl, Pcap = ins[P.R].shape[:3]
    A = nxl * nyl * Pcap
    out[P.R] = ins[P.R].reshape(A, 3)
    for k in (P.Z, P.idx_m, P.atom_mask):
        out[k] = ins[k].reshape(A)
    out[P.n_atoms] = jnp.asarray([A], jnp.int32)
    return out


def make_sharded_column_eval(pot, params, inputs, mesh: Mesh):
    """jit'd (inputs) -> (per-device partial energies [n], forces [A', 3]).

    The global energy is the sum of the partials; forces come back in
    sorted column order (map through ``lay.rank`` for original order).
    Runs the model under shard_map with check_vma=False — the model's
    force engine psums the energy (normalised by the axis size) so
    cross-shard force terms flow back through the halo ppermutes.
    """
    in_specs = column_in_specs(inputs)
    two_d = _mesh_is_2d(mesh)
    fspec = (PartitionSpec(COLS_AXIS, COLS_AXIS_Y) if two_d
             else PartitionSpec(COLS_AXIS))
    espec = (PartitionSpec((COLS_AXIS, COLS_AXIS_Y)) if two_d
             else PartitionSpec(COLS_AXIS))

    def local_eval(ins):
        shape4 = ins[P.R].shape[:3] if ins[P.R].ndim == 4 else None
        ins = _flatten_atoms(ins)
        out = pot.apply(params, ins, do_postprocessing=False)
        forces = out[P.forces]
        if shape4 is not None:
            forces = forces.reshape(*shape4, 3)
        return out[P.energy], forces

    f = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(espec, fspec),
        check_vma=False,
    )
    return jax.jit(f)


def make_sharded_column_md(pot, params, inputs, mesh: Mesh,
                           mass: float = 1.0, dt: float = 0.1,
                           n_steps: int = 5):
    """jit'd (inputs, R0, p0) -> (R_n, p_n): an NVE velocity-Verlet chunk
    run ENTIRELY inside shard_map — positions/momenta stay slab-sharded,
    the integrator is local elementwise math, and the only interconnect
    traffic per step is the column kernels' halo ppermutes.  This is the
    multi-chip MD inner loop (the reference scales MD only via LAMMPS
    domain decomposition; here it is in-framework).
    """
    in_specs = column_in_specs(inputs)
    two_d = _mesh_is_2d(mesh)
    rspec = (PartitionSpec(COLS_AXIS, COLS_AXIS_Y) if two_d
             else PartitionSpec(COLS_AXIS))

    def run(ins, R0, p0):
        shape4 = ins[P.R].shape[:3] if ins[P.R].ndim == 4 else None
        ins = _flatten_atoms(ins)
        if shape4 is not None:
            R0 = R0.reshape(-1, 3)
            p0 = p0.reshape(-1, 3)
        amask = ins[P.atom_mask][:, None]

        def force(R):
            b = dict(ins)
            b[P.R] = R
            out = pot.apply(params, b, do_postprocessing=False)
            return out[P.forces] * amask

        def body(carry, _):
            R, p, f = carry
            p1 = p + 0.5 * dt * f
            R1 = R + dt * p1 / mass
            f1 = force(R1)
            p2 = p1 + 0.5 * dt * f1
            return (R1, p2, f1), None

        f0 = force(R0)
        (Rn, pn, _), _ = jax.lax.scan(body, (R0, p0, f0), None,
                                      length=n_steps)
        if shape4 is not None:
            Rn = Rn.reshape(*shape4, 3)
            pn = pn.reshape(*shape4, 3)
        return Rn, pn

    f = jax.shard_map(
        run, mesh=mesh,
        in_specs=(in_specs, rspec, rspec),
        out_specs=(rspec, rspec),
        check_vma=False,
    )
    return jax.jit(f)


def make_sharded_column_rpmd(pot, params, inputs, mesh: Mesh,
                             n_beads: int = 2, mass: float = 1.0,
                             dt: float = 0.1, n_steps: int = 4,
                             omega: float = 1.0):
    """jit'd (inputs, R0, p0) -> (R_n, p_n) for a ring-polymer (RPMD)
    velocity-Verlet chunk run ENTIRELY inside shard_map.

    ``R0/p0`` carry a leading bead axis [n_beads, A, 3] (replicated over
    the mesh is NOT needed — the bead axis stays unsharded while the atom
    axis is slab/block-sharded).  Per step each bead's potential force is
    a sharded column evaluation (halo ppermutes only); the inter-bead
    harmonic spring force ``-m ω² (2 R_b − R_{b−1} − R_{b+1})`` is local
    elementwise math, so beads add zero interconnect traffic.  This is
    the multi-chip analog of the reference's ring-polymer MD
    (md/integrators.py RingPolymer; System [R, A, 3] replicas).
    """
    in_specs = column_in_specs(inputs)
    two_d = _mesh_is_2d(mesh)
    base = ((COLS_AXIS, COLS_AXIS_Y) if two_d else (COLS_AXIS,))
    rspec = PartitionSpec(None, *base)

    def run(ins, R0, p0):
        shape4 = ins[P.R].shape[:3] if ins[P.R].ndim == 4 else None
        ins = _flatten_atoms(ins)
        if shape4 is not None:
            R0 = R0.reshape(n_beads, -1, 3)
            p0 = p0.reshape(n_beads, -1, 3)
        amask = ins[P.atom_mask][None, :, None]

        def pot_force(R):
            def one(Rb):
                b = dict(ins)
                b[P.R] = Rb
                out = pot.apply(params, b, do_postprocessing=False)
                return out[P.forces]
            return jnp.stack([one(R[b]) for b in range(n_beads)]) * amask

        def spring(R):
            if n_beads == 1:
                return jnp.zeros_like(R)
            up = jnp.roll(R, -1, axis=0)
            dn = jnp.roll(R, 1, axis=0)
            return -mass * omega * omega * (2.0 * R - up - dn) * amask

        def body(carry, _):
            R, p, f = carry
            p1 = p + 0.5 * dt * f
            R1 = R + dt * p1 / mass
            f1 = pot_force(R1) + spring(R1)
            p2 = p1 + 0.5 * dt * f1
            return (R1, p2, f1), None

        f0 = pot_force(R0) + spring(R0)
        (Rn, pn, _), _ = jax.lax.scan(body, (R0, p0, f0), None,
                                      length=n_steps)
        if shape4 is not None:
            Rn = Rn.reshape(n_beads, *shape4, 3)
            pn = pn.reshape(n_beads, *shape4, 3)
        return Rn, pn

    f = jax.shard_map(
        run, mesh=mesh,
        in_specs=(in_specs, rspec, rspec),
        out_specs=(rspec, rspec),
        check_vma=False,
    )
    return jax.jit(f)


def _pad8(v):
    return int(-(-int(v) // 8) * 8)


def make_sharded_column_chunk(pot, params, inputs, mesh, dt, n_steps,
                              gamma=None, kT=None):
    """jit'd (inputs, R_s, p_s, m_s, key) -> (R_s, p_s): an NVE or
    Langevin-NVT velocity-Verlet chunk run entirely inside shard_map.

    Thermostat noise is keyed per (GLOBAL column, step), so the stream is
    independent of how the mesh splits the columns — an 8-device run
    reproduces the 1-device run bit-for-bit, which is what the multichip
    dryrun asserts across a rebuild boundary.
    """
    in_specs = column_in_specs(inputs)
    two_d = _mesh_is_2d(mesh)
    rspec = (PartitionSpec(COLS_AXIS, COLS_AXIS_Y) if two_d
             else PartitionSpec(COLS_AXIS))
    mspec = rspec
    nx_g, ny_g = inputs[P.cell_qcol].shape[:2]
    _mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    px = _mesh_shape.get(COLS_AXIS, 1)
    py = _mesh_shape.get(COLS_AXIS_Y, 1)
    nvt = gamma is not None and kT is not None
    if nvt:
        c1 = float(np.exp(-0.5 * gamma * dt))
        c2 = float(np.sqrt(max(0.0, 1.0 - c1 * c1)))

    def run(ins, R0, p0, m0, key):
        shape4 = ins[P.R].shape[:3] if ins[P.R].ndim == 4 else None
        ins = _flatten_atoms(ins)
        if shape4 is not None:
            R0 = R0.reshape(-1, 3)
            p0 = p0.reshape(-1, 3)
            m0 = m0.reshape(-1)
        amask = ins[P.atom_mask][:, None]
        A_loc = R0.shape[0]
        # LOCAL slab dims: the flat 1-D-mesh layout shards axis 0 (x) of
        # the [nx, ny, P]-major flattened arrays over the cols axis
        nxl = shape4[0] if shape4 is not None else nx_g // px
        nyl = shape4[1] if shape4 is not None else ny_g // py
        Pcap = A_loc // (nxl * nyl)
        minv = jnp.where(m0 > 0, 1.0 / jnp.maximum(m0, 1e-30), 0.0)[:, None]

        if nvt:
            ax = jax.lax.axis_index(COLS_AXIS)
            gx = ax * nxl + jnp.arange(nxl)
            if two_d:
                ay = jax.lax.axis_index(COLS_AXIS_Y)
                gy = ay * nyl + jnp.arange(nyl)
            else:
                gy = jnp.arange(nyl)
            col_ids = (gx[:, None] * ny_g + gy[None, :]).reshape(-1)

            def noise(step_key):
                keys = jax.vmap(jax.random.fold_in,
                                in_axes=(None, 0))(step_key, col_ids)
                xi = jax.vmap(
                    lambda k: jax.random.normal(k, (Pcap, 3), R0.dtype)
                )(keys)
                return xi.reshape(A_loc, 3)

            sig = jnp.sqrt(jnp.maximum(m0 * kT, 0.0))[:, None]

            def ou(p, step_key):
                return c1 * p + c2 * sig * noise(step_key)

        def force(R):
            b = dict(ins)
            b[P.R] = R
            out = pot.apply(params, b, do_postprocessing=False)
            return out[P.forces] * amask

        def body(carry, step):
            R, p, f, key = carry
            if nvt:
                k1 = jax.random.fold_in(key, 2 * step)
                p = ou(p, k1)
            p1 = p + 0.5 * dt * f
            R1 = R + dt * p1 * minv
            f1 = force(R1)
            p2 = p1 + 0.5 * dt * f1
            if nvt:
                k2 = jax.random.fold_in(key, 2 * step + 1)
                p2 = ou(p2, k2)
            return (R1, p2, f1, key), None

        f0 = force(R0)
        (Rn, pn, _, _), _ = jax.lax.scan(
            body, (R0, p0, f0, key), jnp.arange(n_steps))
        if shape4 is not None:
            Rn = Rn.reshape(*shape4, 3)
            pn = pn.reshape(*shape4, 3)
        return Rn, pn

    f = jax.shard_map(
        run, mesh=mesh,
        in_specs=(in_specs, rspec, rspec, mspec, PartitionSpec()),
        out_specs=(rspec, rspec),
        check_vma=False,
    )
    return jax.jit(f)


class SpatialColumnSimulator:
    """Production multi-chip MD: spatial (column-slab/block) decomposition
    with a host re-bin at every chunk boundary.

    This is the in-framework replacement for the reference's LAMMPS-MPI
    scale-out (reference interfaces/lammps/pair_schnetpack.cpp:346-352):
    inside a chunk, positions/momenta stay sharded and the only
    cross-device traffic is the column kernels' halo ppermutes; at chunk
    boundaries the positions return to the host, atoms are RE-BINNED into
    columns (migrants move slabs/devices naturally through the global
    re-sort), and the layout shapes stay sticky/monotonic so rebuilds do
    not recompile.

    Works in MODEL units (positions in the model's position unit, energy
    in the model's energy unit, ``dt``/``masses``/``kT`` in any consistent
    frame).  ``kT``+``gamma`` enable the layout-independent Langevin
    thermostat of :func:`make_sharded_column_chunk`.
    """

    def __init__(self, pot, params, R, Z, masses, cell, mesh,
                 cutoff: float, skin: float = 0.6, dims=None,
                 dt: float = 0.5, kT=None, gamma=None, seed: int = 0,
                 dtype=jnp.float32):
        self.pot, self.params = pot, params
        self.R = np.asarray(R, np.float64)
        self.p = np.zeros_like(self.R)
        self.Z = np.asarray(Z, np.int64)
        self.masses = np.asarray(masses, np.float64)
        self.cell = np.asarray(cell, np.float64)
        self.mesh = mesh
        self.cutoff, self.skin = float(cutoff), float(skin)
        self.dt = float(dt)
        self.kT, self.gamma = kT, gamma
        self.dtype = dtype
        self.key = jax.random.PRNGKey(seed)
        self.rebuilds = 0
        self._dims = dims
        self._C = None
        self._K = None
        self._chunk_fns = {}
        if dims is None:
            # pin nx (and ny for 2-D meshes) to the mesh shape
            from ..ops.cellblock import build_column_layout

            lay0 = build_column_layout(self.R, self.cutoff + self.skin,
                                       self.cell, np.ones(3, bool))
            nx0, ny0 = lay0.qcol.shape[:2]
            shp = dict(zip(mesh.axis_names, mesh.devices.shape))
            px = shp.get(COLS_AXIS, 1)
            py = shp.get(COLS_AXIS_Y, 1)
            nx = max(nx0 // px, 1) * px
            ny = max(ny0 // py, 1) * py
            self._dims = (nx, ny, 1)

    def _layout(self):
        from ..ops.cellblock import CapacityError, build_column_layout

        rc = self.cutoff + self.skin
        pbc = np.ones(3, bool)
        try:
            lay = build_column_layout(
                self.R, rc, self.cell, pbc, dims=self._dims,
                capacity=self._C, bucket_size=self._K)
        except CapacityError:
            self._C = self._K = None
            lay = build_column_layout(self.R, rc, self.cell, pbc,
                                      dims=self._dims)
        if self._C is None:
            _, _, P0, ks0 = lay.dims
            self._C = _pad8(P0 + 8)
            self._K = tuple(_pad8(k + max(8, k // 8)) for k in ks0)
            lay = build_column_layout(
                self.R, rc, self.cell, pbc, dims=self._dims,
                capacity=self._C, bucket_size=self._K)
        return lay

    def _chunk_fn(self, inputs, n_steps):
        key = (inputs[P.cell_qcol].shape, n_steps)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = make_sharded_column_chunk(
                self.pot, self.params, inputs, self.mesh, self.dt,
                n_steps, gamma=self.gamma, kT=self.kT)
        return self._chunk_fns[key]

    def simulate(self, n_steps: int, chunk_size: int = 50):
        two_d = _mesh_is_2d(self.mesh)
        left = int(n_steps)
        while left > 0:
            n = min(chunk_size, left)
            lay = self._layout()
            self.rebuilds += 1
            inputs = column_inputs(lay, self.R, self.Z, dtype=self.dtype,
                                   mesh_2d=two_d)
            order, rank = lay.order, lay.rank
            smask = (lay.slot_mask > 0)
            R_s = jnp.asarray(self.R[order] * smask[:, None], self.dtype)
            p_s = jnp.asarray(self.p[order] * smask[:, None], self.dtype)
            m_s = jnp.asarray(self.masses[order] * smask, self.dtype)
            if two_d:
                nx, ny, _ = lay.qcol.shape
                Pcap = len(order) // (nx * ny)
                R_s = R_s.reshape(nx, ny, Pcap, 3)
                p_s = p_s.reshape(nx, ny, Pcap, 3)
                m_s = m_s.reshape(nx, ny, Pcap)
            self.key, sub = jax.random.split(self.key)
            Rn, pn = self._chunk_fn(inputs, n)(inputs, R_s, p_s, m_s, sub)
            Rn = np.asarray(jax.device_get(Rn)).reshape(-1, 3)
            pn = np.asarray(jax.device_get(pn)).reshape(-1, 3)
            self.R = Rn[rank]
            self.p = pn[rank]
            left -= n
        return self.R, self.p
