"""On-device column neighbor-state rebuild vs the host builder."""
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from schnetpack_tpu import properties as P
from schnetpack_tpu.ops.cellblock import build_column_layout
from schnetpack_tpu.ops.colblock_rebuild import rebuild_column_state


def _edge_set(qcol, dcol, coff, emask, nx, ny, P_cap, ksizes):
    """Canonical set of (i_global, j_global, rounded offset) triples."""
    from schnetpack_tpu.ops.colblock import ColRefs, _decode_i, _decode_j

    refs = ColRefs(jnp.asarray(qcol), jnp.asarray(dcol), P_cap,
                   tuple(ksizes))
    j, vj = _decode_j(refs)
    i, vi = _decode_i(refs)
    m = np.asarray(emask) > 0
    assert (np.asarray(vj) == m).all() and (np.asarray(vi) == m).all()
    return set(
        (int(a), int(b), *np.round(np.asarray(o), 4))
        for a, b, o in zip(np.asarray(i)[m], np.asarray(j)[m],
                           np.asarray(coff)[m])
    )


def test_device_rebuild_matches_host():
    rng = np.random.RandomState(0)
    L = 14.0
    n = 220
    R0 = rng.uniform(0, L, size=(n, 3))
    cell = np.eye(3) * L
    rc = 3.5
    lay = build_column_layout(R0, rc, cell, np.ones(3, bool),
                              capacity_headroom=4)
    nx, ny, Pc, ks = lay.dims
    assert nx >= 3 and ny >= 3
    # pad bucket capacities so the perturbed state fits
    ks2 = tuple(k + 64 for k in ks)
    lay = build_column_layout(R0, rc, cell, np.ones(3, bool),
                              capacity=Pc, bucket_size=ks2,
                              dims=(nx, ny, 1))

    # perturb (below the stencil slack) and rebuild both ways
    R1 = R0 + rng.uniform(-0.15, 0.15, R0.shape)
    lay1 = build_column_layout(
        R1[lay.order][np.argsort(lay.rank)] if False else R1,
        rc, cell, np.ones(3, bool), capacity=Pc, bucket_size=ks2,
        dims=(nx, ny, 1),
    )
    # host rebuild re-bins atoms; to compare the EDGE SETS we need both
    # sides in the same atom labels -> map sorted slots back to original
    host_edges = set()
    m = lay1.emask > 0
    for a, b, o in zip(lay1.icol[m], lay1.jcol[m], lay1.offcol[m]):
        host_edges.add((int(lay1.order[a]), int(lay1.order[b]),
                        *np.round(o, 4)))

    # device rebuild keeps the ORIGINAL binning (lay, built from R0)
    R1_sorted = jnp.asarray(R1[lay.order], jnp.float32) * jnp.asarray(
        lay.slot_mask, jnp.float32)[:, None]
    state, ovf = rebuild_column_state(
        R1_sorted[None], jnp.asarray(lay.slot_mask),
        jnp.asarray(cell, jnp.float32),
        nx=nx, ny=ny, P=Pc, ksizes=ks2, rc=rc,
    )
    assert not bool(ovf)
    dev = _edge_set(state["qcol"], state["dcol"], state["coff"],
                    state["emask"], nx, ny, Pc, ks2)
    dev_edges = set(
        (int(lay.order[a]), int(lay.order[b]), ox, oy, oz)
        for a, b, ox, oy, oz in dev
    )
    assert dev_edges == host_edges


def test_device_rebuild_union_over_beads():
    rng = np.random.RandomState(1)
    L = 12.0
    n = 150
    R0 = rng.uniform(0, L, size=(n, 3))
    cell = np.eye(3) * L
    rc = 3.2
    lay = build_column_layout(R0, rc, cell, np.ones(3, bool),
                              capacity_headroom=4, dims=(3, 3, 1))
    nx, ny, Pc, ks = lay.dims
    ks2 = tuple(k + 64 for k in ks)
    beads = np.stack([R0 + rng.normal(0, 0.05, R0.shape) for _ in range(4)])
    Rb = jnp.asarray(beads[:, lay.order], jnp.float32) * jnp.asarray(
        lay.slot_mask, jnp.float32)[None, :, None]
    state, ovf = rebuild_column_state(
        Rb, jnp.asarray(lay.slot_mask), jnp.asarray(cell, jnp.float32),
        nx=nx, ny=ny, P=Pc, ksizes=ks2, rc=rc,
    )
    assert not bool(ovf)
    # every per-bead edge must be present in the union
    got = _edge_set(state["qcol"], state["dcol"], state["coff"],
                    state["emask"], nx, ny, Pc, ks2)
    got_pairs = {(a, b) for a, b, *_ in got}
    from schnetpack_tpu.transform.neighborlist import neighbor_list
    for r in range(4):
        ii, jj, S = neighbor_list(beads[r], rc, cell, np.ones(3, bool))
        for a, b in zip(ii, jj):
            ra, rb = int(lay.rank[a]), int(lay.rank[b])
            assert (ra, rb) in got_pairs


def _nvt_argon_sim(n_steps=0, chunk_size=10, seed=7):
    """Small periodic PaiNN NVT setup on the cellblock column NBL."""
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import (
        MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
    )
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 3.0
    rng = np.random.RandomState(seed)
    pos = (np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T * 3.2 + 1.0
           + rng.uniform(-0.05, 0.05, (64, 3)))
    cell = np.eye(3) * 12.8
    mol = {P.Z: np.full(64, 18, np.int64), P.R: pos, P.cell: cell,
           P.pbc: np.ones(3, bool)}
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(cutoff)(
        {P.Z: mol[P.Z][:16], P.R: mol[P.R][:16], P.cell: np.zeros((3, 3)),
         P.pbc: np.zeros(3, bool)})
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(24, 512, 2)))
    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(600.0).initialize_system(
        system, jax.random.PRNGKey(3))
    calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                cutoff_shell=0.4,
                                neighbor_list="cellblock")
    sim = Simulator(system, VelocityVerlet(1.0), calc, progress=False,
                    log_keys=("temperature",))
    if n_steps:
        sim.simulate(n_steps, chunk_size=chunk_size)
    return sim, pot, params, cutoff


def test_restart_roundtrip_cellblock():
    """state_dict -> fresh Simulator (fresh NBL, never built) ->
    load_state_dict -> simulate must not crash and must keep the skin
    invariant (regression: device_step_update read _dev_rebuild off a
    never-built NBL after restore)."""
    from schnetpack_tpu.md import Simulator, VelocityVerlet, load_molecules
    from schnetpack_tpu.md.calculators import SchNetPackCalculator

    sim, pot, params, cutoff = _nvt_argon_sim(n_steps=30, chunk_size=10)
    saved = sim.state_dict()
    E_saved = np.asarray(sim.state.system.positions).copy()

    # brand-new everything: model/calculator/simulator; the NBL inside the
    # new calculator has never seen build()
    mol = {P.Z: np.asarray(sim.system.atomic_numbers),
           P.R: np.asarray(sim.system.positions[0]),
           P.cell: np.asarray(sim.system.cells[0, 0]),
           P.pbc: np.ones(3, bool)}
    calc2 = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                 cutoff_shell=0.4,
                                 neighbor_list="cellblock")
    sim2 = Simulator(load_molecules([mol]), VelocityVerlet(1.0), calc2,
                     progress=False, log_keys=("temperature",))
    sim2.load_state_dict(saved)
    # restore must rehydrate the NBL host statics
    assert calc2.dense_nbl._state is not None
    np.testing.assert_allclose(
        np.asarray(sim2.state.system.positions), E_saved, rtol=1e-6)

    sim2.simulate(40, chunk_size=10)
    assert sim2.n_simulated == 30 + 40
    assert np.isfinite(np.asarray(sim2.system.positions)).all()
    # in-scan skin invariant: displacement since last rebuild stays under
    # (skin/2)^2 at every chunk boundary
    nbl = calc2.dense_nbl
    cs = sim2.state.calc_state
    if "nbl_build_R" in cs:
        disp2 = float(jnp.max(jnp.sum(
            (sim2.state.system.positions - cs["nbl_build_R"]) ** 2, -1)))
        assert disp2 <= (nbl.skin / 2.0) ** 2 + 1e-6


def test_overflow_latch_grows_capacity():
    """Force a bucket-capacity overflow inside the scan: the latch must
    surface at the chunk boundary, warn, and grow capacities via the host
    builder (list stays usable afterwards)."""
    import warnings as _warnings

    sim, *_ = _nvt_argon_sim(n_steps=10, chunk_size=10)
    calc = sim.calculator
    nbl = calc.dense_nbl
    assert nbl._dev_rebuild is not None
    # compress every atom toward one corner: real bucket occupancy exceeds
    # the sticky capacities (shapes stay static; only the fill overflows),
    # and disp2 >> (skin/2)^2 triggers the in-scan rebuild immediately
    st = sim.state
    squeezed = st.system.positions * 0.25 + 1.0
    sim._state = st.replace(system=st.system.replace(positions=squeezed))
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        sim.simulate(10, chunk_size=10)
    assert any("overflow" in str(w.message) for w in rec)
    # host grow path restored a valid (larger-capacity) state
    assert nbl._state is not None
    assert np.isfinite(np.asarray(sim.system.positions)).all()


def test_md_loop_rebuilds_without_host(monkeypatch):
    """NVT run hot enough to trigger rebuilds: after the first build, the
    host builder is forbidden — all rebuilds must happen on device."""
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import (
        MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
    )
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.md.neighborlist_md import CellBlockNeighborListMD
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 3.0
    rng = np.random.RandomState(7)
    pos = (np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T * 3.2 + 1.0
           + rng.uniform(-0.05, 0.05, (64, 3)))
    cell = np.eye(3) * 12.8
    mol = {P.Z: np.full(64, 18, np.int64), P.R: pos, P.cell: cell,
           P.pbc: np.ones(3, bool)}
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(cutoff)(
        {P.Z: mol[P.Z][:16], P.R: mol[P.R][:16], P.cell: np.zeros((3, 3)),
         P.pbc: np.zeros(3, bool)})
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(24, 512, 2)))
    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(600.0).initialize_system(
        system, jax.random.PRNGKey(3))
    calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                cutoff_shell=0.4,
                                neighbor_list="cellblock")
    sim = Simulator(system, VelocityVerlet(1.0), calc, progress=False,
                    log_keys=("temperature",))
    sim.simulate(10, chunk_size=10)   # first chunk may host-build lazily

    nbl = calc.dense_nbl
    assert nbl._dev_rebuild is not None, "device rebuild not eligible"
    ref0 = nbl._build_positions_dev

    def forbidden(self, system):
        raise AssertionError("host rebuild after init is forbidden")

    monkeypatch.setattr(CellBlockNeighborListMD, "build", forbidden)
    sim.simulate(120, chunk_size=12)
    assert nbl._build_positions_dev is not ref0, "no rebuild ever triggered"
    assert np.isfinite(np.asarray(sim.system.positions)).all()


def test_retighten_shrinks_capacity_and_keeps_md_exact():
    """bench.py's post-equilibration capacity retighten: shapes shrink,
    forces after retighten match a fresh evaluation bit-for-bit, and the
    MD loop keeps running (recompile + grow-on-overflow still works)."""
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md import (
        MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
    )
    from schnetpack_tpu.md.calculators import SchNetPackCalculator
    from schnetpack_tpu.md.neighborlist_md import CellBlockNeighborListMD
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform
    from schnetpack_tpu.units import _parse_unit, md_units

    cutoff = 3.0
    rng = np.random.RandomState(7)
    pos = (np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T * 3.2 + 1.0
           + rng.uniform(-0.05, 0.05, (64, 3)))
    cell = np.eye(3) * 12.8
    mol = {P.Z: np.full(64, 18, np.int64), P.R: pos, P.cell: cell,
           P.pbc: np.ones(3, bool)}
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(cutoff)(
        {P.Z: mol[P.Z][:16], P.R: mol[P.R][:16], P.cell: np.zeros((3, 3)),
         P.pbc: np.zeros(3, bool)})
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(24, 512, 2)))
    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(300.0).initialize_system(
        system, jax.random.PRNGKey(3))
    conv = _parse_unit("Ang") * md_units().length
    nbl = CellBlockNeighborListMD(cutoff * conv, skin=0.4 * conv,
                                  layout="column")
    calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                cutoff_shell=0.4, neighbor_list=nbl)
    sim = Simulator(system, VelocityVerlet(1.0), calc, progress=False,
                    log_keys=("temperature",))
    sim.simulate(10, chunk_size=10)

    K_before = sum(nbl._K)
    nbl.retighten(sim.state.system, jitter_fraction=0.05,
                  bucket_headroom=1.0 / 24.0)
    K_after = sum(nbl._K)
    assert K_after <= K_before, (K_before, K_after)

    # forces on the retightened layout match a fresh calculator exactly
    R_now = np.asarray(sim.state.system.positions)
    sim.simulate(10, chunk_size=10)
    assert np.isfinite(np.asarray(sim.state.system.positions)).all()

    nbl2 = CellBlockNeighborListMD(cutoff * conv, skin=0.4 * conv,
                                   layout="column")
    calc2 = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                 cutoff_shell=0.4, neighbor_list=nbl2)
    sys2 = load_molecules([mol])
    sys2 = sys2.replace(positions=jnp.asarray(R_now))
    out1 = calc.calculate(sim.state.system.replace(
        positions=jnp.asarray(R_now)), None)
    out2 = calc2.calculate(sys2, None)
    f1 = np.asarray(out1.forces)
    f2 = np.asarray(out2.forces)
    np.testing.assert_allclose(f1, f2, rtol=2e-5, atol=2e-6)
