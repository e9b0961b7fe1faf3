"""Slab-sharded column kernels on an 8-device CPU mesh.

VERDICT round-1 item #2: real atom-sharded multi-chip path — each shard
owns a contiguous slab of xy-columns and exchanges only boundary column
planes via ppermute.  Checks:

* sharded forces == replicated single-run forces (f32 resolution);
* global energy (psum) == replicated energy;
* the compiled HLO moves data with collective-permute only — no
  all-gather of the feature table (per-device traffic O(A/n + halo)).
"""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from schnetpack_tpu import properties as P
from schnetpack_tpu.ops import cellblock as cb
from schnetpack_tpu.ops.cellblock import build_column_layout
from schnetpack_tpu.ops.colblock_shard import COLS_AXIS


def _system(n=2000, L=48.0, cutoff=5.5, seed=0):
    rng = np.random.RandomState(seed)
    R = rng.uniform(0, L, size=(n, 3))
    Z = rng.randint(1, 9, n).astype(np.int64)
    cell = np.eye(3) * L
    return R, Z, cell


def _model(cutoff):
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy, n_out=1, n_layers=2),
                        Forces()],
    )
    rng = np.random.RandomState(1)
    probe = {
        P.Z: np.full(12, 6, np.int64), P.R: rng.rand(12, 3) * 4,
        P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
    }
    probe = NeighborListTransform(cutoff)(probe)
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(16, 512, 2)))
    return pot, params


def _column_inputs(lay, R, Z, sharded):
    """Model inputs in sorted column space (full arrays)."""
    Ap = len(lay.order)
    order = lay.order
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    inputs = {
        P.R: jnp.asarray(R[order] * (lay.slot_mask[:, None] > 0), dt),
        P.Z: jnp.asarray(Z[order] * (lay.slot_mask > 0).astype(np.int64)),
        P.idx_m: jnp.zeros(Ap, jnp.int32),
        P.atom_mask: jnp.asarray(lay.slot_mask, dt),
        P.n_atoms: jnp.asarray([Ap], jnp.int32),
        P.cell_qcol: jnp.asarray(lay.qcol),
        P.cell_dcol: jnp.asarray(lay.dcol),
        P.cell_coff: jnp.asarray(lay.offcol, dt),
        P.cell_emask: jnp.asarray(lay.emask, dt),
        P.cell_ksz: tuple(jnp.zeros((k,), jnp.int8) for k in lay.ksizes),
        # empty flat pair list (the model tolerates zero real pairs)
        P.idx_i: jnp.zeros(1, jnp.int32),
        P.idx_j: jnp.zeros(1, jnp.int32),
        P.offsets: jnp.full((1, 3), 1e3, dt),
        P.pair_mask: jnp.zeros(1, dt),
    }
    if sharded:
        inputs[P.cell_shard] = jnp.zeros(1, jnp.int8)
    return inputs


def _shard_fn(pot, params, lay, full_inputs, n_dev):
    """Force/energy eval under shard_map over x-slabs of columns."""
    nx, ny, Pcap, _ = lay.dims
    Ap = len(lay.order)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (COLS_AXIS,))

    col_sharded = {P.cell_qcol, P.cell_dcol, P.cell_coff, P.cell_emask}

    def specs_of(k, v):
        if k in col_sharded:
            return Pspec(COLS_AXIS)
        if k in (P.R, P.Z, P.idx_m, P.atom_mask):
            return Pspec(COLS_AXIS)          # [Ap] = [nx*ny*P] row-sharded
        return Pspec()

    in_specs = {k: (specs_of(k, v) if not isinstance(v, tuple)
                    else tuple(Pspec() for _ in v))
                for k, v in full_inputs.items()}

    def local_eval(inputs):
        out = pot.apply(params, inputs, do_postprocessing=False)
        return out[P.energy], out[P.forces]

    from jax import shard_map

    f = shard_map(
        local_eval, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(Pspec(COLS_AXIS), Pspec(COLS_AXIS)),
        check_vma=False,
    )
    return jax.jit(f), mesh


@pytest.mark.parametrize("impl", ["xla"])
def test_sharded_forces_match_replicated(impl):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    old_impl = cb.IMPL
    cb.IMPL = impl
    try:
        cutoff = 5.0
        R, Z, cell = _system()
        lay = build_column_layout(R, cutoff, cell, np.ones(3, bool),
                                  dims=(8, 8, 1))
        pot, params = _model(cutoff)

        # replicated reference
        ref_in = _column_inputs(lay, R, Z, sharded=False)
        out = pot.apply(params, dict(ref_in), do_postprocessing=False)
        e_ref = np.asarray(out[P.energy]).sum()
        f_ref = np.asarray(out[P.forces])

        # sharded run
        sh_in = _column_inputs(lay, R, Z, sharded=True)
        f, mesh = _shard_fn(pot, params, lay, sh_in, 8)
        with mesh:
            e_sh, f_sh = f(sh_in)
        # per-device energies are local partials; their sum is global
        np.testing.assert_allclose(np.asarray(e_sh).sum(), e_ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(f_sh), f_ref,
                                   rtol=1e-4, atol=1e-5)

        # traffic shape: collective permutes only, no feature all-gather
        hlo = f.lower(sh_in).compile().as_text()
        assert "collective-permute" in hlo
        for m in re.finditer(r"all-gather[^=]*=\s*(\S+)\s", hlo):
            shape = m.group(1)
            nums = [int(x) for x in re.findall(r"\d+", shape)]
            assert np.prod(nums or [1]) < 10_000, (
                f"large all-gather in sharded HLO: {shape}")
    finally:
        cb.IMPL = old_impl


def test_sharded_kernels_interpret_small():
    """The Pallas kernel path (interpret mode) under shard_map."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    old_impl, old_pieces = cb.IMPL, cb.PIECES
    cb.IMPL, cb.PIECES = "pallas_interpret", 3
    try:
        cutoff = 3.0
        R, Z, cell = _system(n=400, L=24.0, cutoff=3.0, seed=3)
        lay = build_column_layout(R, cutoff, cell, np.ones(3, bool),
                                  dims=(8, 8, 1))
        pot, params = _model(cutoff)

        cb.IMPL = "xla"
        ref_in = _column_inputs(lay, R, Z, sharded=False)
        out = pot.apply(params, dict(ref_in), do_postprocessing=False)
        f_ref = np.asarray(out[P.forces])

        cb.IMPL = "pallas_interpret"
        sh_in = _column_inputs(lay, R, Z, sharded=True)
        f, mesh = _shard_fn(pot, params, lay, sh_in, 8)
        with mesh:
            e_sh, f_sh = f(sh_in)
        np.testing.assert_allclose(np.asarray(f_sh), f_ref,
                                   rtol=2e-4, atol=2e-5)
    finally:
        cb.IMPL, cb.PIECES = old_impl, old_pieces


def test_sharded_2d_block_forces_match_replicated():
    """2-D (x, y) block decomposition via the user-facing columns API:
    forces and energy match the replicated run on a (4, 2) device mesh
    (VERDICT r3 #7 — meshes larger than nx can shard)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from schnetpack_tpu.parallel.columns import (
        column_inputs, make_column_mesh, make_sharded_column_eval,
    )

    cutoff = 5.0
    R, Z, cell = _system()
    lay = build_column_layout(R, cutoff, cell, np.ones(3, bool),
                              dims=(8, 8, 1))
    pot, params = _model(cutoff)

    ref_in = column_inputs(lay, R, Z, sharded=False)
    out = pot.apply(params, dict(ref_in), do_postprocessing=False)
    e_ref = np.asarray(out[P.energy]).sum()
    f_ref = np.asarray(out[P.forces])

    sh_in = column_inputs(lay, R, Z, sharded=True, mesh_2d=True)
    mesh = make_column_mesh(8, dims=(4, 2))
    f = make_sharded_column_eval(pot, params, sh_in, mesh)
    with mesh:
        e_sh, f_sh = f(sh_in)
    np.testing.assert_allclose(np.asarray(e_sh).sum(), e_ref, rtol=1e-5)
    nx, ny, _ = lay.qcol.shape
    Pcap = len(lay.order) // (nx * ny)
    np.testing.assert_allclose(
        np.asarray(f_sh).reshape(-1, 3), f_ref, rtol=1e-4, atol=1e-5)

    hlo = f.lower(sh_in).compile().as_text()
    assert "collective-permute" in hlo
    for m in re.finditer(r"all-gather[^=]*=\s*(\S+)\s", hlo):
        shape = m.group(1)
        nums = [int(x) for x in re.findall(r"\d+", shape)]
        assert np.prod(nums or [1]) < 10_000, (
            f"large all-gather in 2-D sharded HLO: {shape}")


def test_sharded_2d_md_chunk_matches_unsharded():
    """Velocity-Verlet chunk inside shard_map on the 2-D block mesh."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from schnetpack_tpu.parallel.columns import (
        column_inputs, make_column_mesh, make_sharded_column_md,
    )

    cutoff = 4.0
    R, Z, cell = _system(n=480, L=16.4, cutoff=4.0, seed=11)
    lay = build_column_layout(R, cutoff, cell, np.ones(3, bool),
                              dims=(4, 4, 1))
    pot, params = _model(cutoff)

    sh_in = column_inputs(lay, R, Z, sharded=True, mesh_2d=True)
    mesh = make_column_mesh(8, dims=(4, 2))
    nx, ny, _ = lay.qcol.shape
    Pcap = len(lay.order) // (nx * ny)
    rng = np.random.RandomState(5)
    R0 = sh_in[P.R]
    p0 = jnp.asarray(rng.randn(nx, ny, Pcap, 3) * 0.02,
                     R0.dtype) * sh_in[P.atom_mask][..., None]
    md = make_sharded_column_md(pot, params, sh_in, mesh,
                                mass=10.0, dt=0.05, n_steps=4)
    with mesh:
        Rn, pn = md(sh_in, R0, p0)

    # unsharded reference chunk
    ref_in = column_inputs(lay, R, Z, sharded=False)
    amask = np.asarray(ref_in[P.atom_mask])[:, None]

    def force_ref(Rf):
        b = dict(ref_in)
        b[P.R] = jnp.asarray(Rf)
        return np.asarray(
            pot.apply(params, b, do_postprocessing=False)[P.forces]) * amask

    R_r = np.asarray(R0).reshape(-1, 3)
    p_r = np.asarray(p0).reshape(-1, 3)
    f_r = force_ref(R_r)
    for _ in range(4):
        p1 = p_r + 0.5 * 0.05 * f_r
        R_r = R_r + 0.05 * p1 / 10.0
        f_r = force_ref(R_r)
        p_r = p1 + 0.5 * 0.05 * f_r
    err = np.abs(np.asarray(Rn).reshape(-1, 3) - R_r).max()
    assert err < 1e-4, f"2-D sharded MD diverged: {err}"


class TestSpatialColumnSimulator:
    """Production sharded MD driver (VERDICT r4 #3): host re-bin at chunk
    boundaries, sharded NVT chunks, thermostat noise independent of the
    mesh layout — an 8-device run must reproduce the 1-device run across
    REBUILD boundaries (atoms migrate columns/slabs between chunks)."""

    def test_nvt_trajectory_crosses_rebuilds_and_matches_unsharded(self):
        from schnetpack_tpu.parallel.columns import (
            SpatialColumnSimulator, make_column_mesh,
        )

        # column edge must exceed cutoff+skin (9-column stencil) AND nx
        # must divide by the device count: 8 slabs of 5 A in a 40 A box
        cutoff, L = 4.0, 40.0
        rng = np.random.RandomState(7)
        n = 600
        R = rng.uniform(0, L, size=(n, 3))
        Z = np.full(n, 18, np.int64)
        masses = np.full(n, 39.9)
        cell = np.eye(3) * L
        pot, params = _model(cutoff)

        def run(n_dev):
            mesh = make_column_mesh(n_dev)
            sim = SpatialColumnSimulator(
                pot, params, R, Z, masses, cell, mesh, cutoff=cutoff,
                skin=0.5, dims=(8, 8, 1), dt=0.4, kT=0.03, gamma=0.05,
                seed=11,
            )
            # 3 chunks -> 2 rebuild boundaries crossed mid-trajectory
            sim.simulate(18, chunk_size=6)
            return sim

        sim1 = run(1)
        sim8 = run(8)
        assert sim1.rebuilds == sim8.rebuilds == 3
        # atoms actually moved (thermostat is live)
        assert np.abs(sim1.R - R).max() > 1e-3
        np.testing.assert_allclose(sim8.R, sim1.R, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(sim8.p, sim1.p, rtol=2e-4, atol=2e-4)
        assert np.isfinite(sim8.R).all() and np.isfinite(sim8.p).all()

    def test_nve_energy_sane_across_rebuilds(self):
        from schnetpack_tpu.parallel.columns import (
            SpatialColumnSimulator, make_column_mesh,
        )

        cutoff, L = 4.0, 40.0
        rng = np.random.RandomState(9)
        n = 500
        R = rng.uniform(0, L, size=(n, 3))
        Z = np.full(n, 18, np.int64)
        masses = np.full(n, 39.9)
        cell = np.eye(3) * L
        pot, params = _model(cutoff)
        mesh = make_column_mesh(4)
        sim = SpatialColumnSimulator(
            pot, params, R, Z, masses, cell, mesh, cutoff=cutoff,
            skin=0.5, dims=(8, 8, 1), dt=0.2, seed=3,
        )
        sim.simulate(12, chunk_size=4)   # 3 chunks, NVE
        assert sim.rebuilds == 3
        assert np.isfinite(sim.R).all() and np.isfinite(sim.p).all()
        # displacement bounded (no integrator blow-up through rebuilds)
        assert np.abs(sim.R - R).max() < 5.0
