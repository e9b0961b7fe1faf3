"""Column-bucketed neighbor layout: layout decode, primitive equivalence,
fused-message grads, and MD parity vs the dense layout."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.ops import cellblock as cb
from schnetpack_tpu.ops.cellblock import build_column_layout
from schnetpack_tpu.ops.colblock import (
    ColRefs,
    _column_fold_xla,
    _column_gather_xla,
    _column_expand_xla,
    _decode_i,
    _decode_j,
    _painn_message_xla,
)


def _random_box(n=120, L=12.0, seed=0):
    rng = np.random.RandomState(seed)
    R = rng.uniform(0, L, size=(n, 3))
    cell = np.eye(3) * L
    return R, cell


def _layout(n=120, L=12.0, seed=0, cutoff=3.5):
    R, cell = _random_box(n, L, seed)
    return build_column_layout(R, cutoff, cell, np.ones(3, bool)), R, cell


class TestLayout:
    def test_decode_matches_builder(self):
        lay, R, cell = _layout()
        refs = ColRefs.from_layout(lay)
        j, vj = _decode_j(refs)
        i, vi = _decode_i(refs)
        m = lay.emask > 0
        np.testing.assert_array_equal(np.asarray(vj), m)
        np.testing.assert_array_equal(np.asarray(vi), m)
        np.testing.assert_array_equal(np.asarray(j)[m], lay.jcol[m])
        np.testing.assert_array_equal(np.asarray(i)[m], lay.icol[m])

    def test_edges_match_brute_force(self):
        from schnetpack_tpu.transform.neighborlist import neighbor_list

        lay, R, cell = _layout(n=80, L=10.0, seed=1, cutoff=3.2)
        ii, jj, S = neighbor_list(R, 3.2, cell, np.ones(3, bool))
        m = lay.emask > 0
        got = sorted(
            (int(lay.order[a]), int(lay.order[b]), *np.round(o, 4))
            for a, b, o in zip(lay.icol[m], lay.jcol[m], lay.offcol[m])
        )
        off_ref = S @ cell
        want = sorted(
            (int(a), int(b), *np.round(o, 4))
            for a, b, o in zip(ii, jj, off_ref)
        )
        assert got == want

    def test_nonperiodic(self):
        rng = np.random.RandomState(3)
        R = rng.uniform(0, 6.0, size=(25, 3))
        lay = build_column_layout(R, 2.5)
        d = np.linalg.norm(R[:, None] - R[None, :], axis=-1)
        np.fill_diagonal(d, 1e9)
        assert int(lay.emask.sum()) == (d < 2.5).sum()


class TestPrimitivesXLA:
    def test_gather_expand_fold(self):
        lay, R, _ = _layout(seed=2)
        refs = ColRefs.from_layout(lay)
        Ap = len(lay.order)
        rng = np.random.RandomState(5)
        table = jnp.asarray(rng.randn(Ap, 16), jnp.float32)
        m = lay.emask > 0

        g = _column_gather_xla(table, refs)
        np.testing.assert_allclose(
            np.asarray(g)[m], np.asarray(table)[lay.jcol[m]], rtol=1e-6)
        assert np.abs(np.asarray(g)[~m]).max() == 0

        e = _column_expand_xla(table, refs)
        np.testing.assert_allclose(
            np.asarray(e)[m], np.asarray(table)[lay.icol[m]], rtol=1e-6)

        vals = jnp.asarray(rng.randn(*lay.emask.shape, 16), jnp.float32)
        f = _column_fold_xla(vals, refs)
        ref = np.zeros((Ap, 16), np.float32)
        np.add.at(ref, lay.icol[m], np.asarray(vals)[m])
        np.testing.assert_allclose(f, ref, rtol=1e-5, atol=1e-5)


class TestPrimitivesPallas:
    """Interpret-mode Pallas kernels vs the XLA reference, incl. VJPs."""

    def setup_method(self, method):
        self._impl, self._pieces = cb.IMPL, cb.PIECES
        cb.IMPL, cb.PIECES = "pallas_interpret", 3

    def teardown_method(self, method):
        cb.IMPL, cb.PIECES = self._impl, self._pieces

    def test_gather_fwd_bwd(self):
        from schnetpack_tpu.ops.colblock_pallas import column_gather_pallas

        lay, R, _ = _layout(seed=4, n=100, L=10.0, cutoff=3.4)
        refs = ColRefs.from_layout(lay)
        Ap = len(lay.order)
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.randn(Ap, 128), jnp.float32)
        w = jnp.asarray(rng.randn(*lay.emask.shape, 128), jnp.float32)

        out = column_gather_pallas(table, refs)
        ref = _column_gather_xla(table, refs)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

        g1 = jax.grad(lambda t: jnp.sum(column_gather_pallas(t, refs) * w))(table)
        g2 = jax.grad(lambda t: jnp.sum(_column_gather_xla(t, refs) * w))(table)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)

    def test_expand_fold_fwd_bwd(self):
        from schnetpack_tpu.ops.colblock_pallas import (
            column_expand_pallas, column_fold_pallas,
        )

        lay, R, _ = _layout(seed=6, n=100, L=10.0, cutoff=3.4)
        refs = ColRefs.from_layout(lay)
        Ap = len(lay.order)
        rng = np.random.RandomState(1)
        table = jnp.asarray(rng.randn(Ap, 128), jnp.float32)
        vals = jnp.asarray(rng.randn(*lay.emask.shape, 128), jnp.float32)
        w = jnp.asarray(rng.randn(*lay.emask.shape, 128), jnp.float32)

        out = column_expand_pallas(table, refs)
        np.testing.assert_allclose(
            out, _column_expand_xla(table, refs), rtol=1e-6, atol=1e-6)
        f = column_fold_pallas(vals, refs)
        np.testing.assert_allclose(
            f, _column_fold_xla(vals, refs), rtol=1e-5, atol=1e-5)

        g1 = jax.grad(lambda t: jnp.sum(column_expand_pallas(t, refs) * w))(table)
        g2 = jax.grad(lambda t: jnp.sum(_column_expand_xla(t, refs) * w))(table)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)

    def test_fused_message_and_grads(self):
        from schnetpack_tpu.ops.colblock_pallas import (
            painn_message_columns_pallas,
        )

        lay, R, _ = _layout(seed=8, n=90, L=10.0, cutoff=3.4)
        refs = ColRefs.from_layout(lay)
        Ap = len(lay.order)
        F = 32
        rng = np.random.RandomState(9)
        xmu = jnp.asarray(rng.randn(Ap, 6 * F), jnp.float32)
        rbf = jnp.asarray(rng.randn(*lay.emask.shape, 9), jnp.float32)
        rbf = rbf * jnp.asarray(lay.emask)[..., None]
        dirs = jnp.asarray(rng.randn(*lay.emask.shape, 3), jnp.float32)
        FW = jnp.asarray(rng.randn(9, 3 * F) * 0.3, jnp.float32)

        def loss(args, fused):
            x, rb, dr, fw = args
            if fused:
                dq, dmu = painn_message_columns_pallas(x, rb, dr, fw, refs)
            else:
                dq, dmu = _painn_message_xla(x, rb, dr, fw, refs)
            return jnp.sum(jnp.sin(dq)) + jnp.sum(jnp.cos(dmu) * 0.5)

        args = (xmu, rbf, dirs, FW)
        v1, g1 = jax.value_and_grad(lambda a: loss(a, True))(args)
        v2, g2 = jax.value_and_grad(lambda a: loss(a, False))(args)
        np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
        for n, a, b in zip(["xmu", "rbf", "dir", "FW"], g1, g2):
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=2e-4, err_msg=f"grad {n}")


class TestMDParity:
    def _build(self, neighbor_list, pos, cell):
        from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
        from schnetpack_tpu.data.loader import PaddingSpec, collate
        from schnetpack_tpu.md import MaxwellBoltzmannInit, load_molecules
        from schnetpack_tpu.md.calculators import SchNetPackCalculator
        from schnetpack_tpu.model import NeuralNetworkPotential
        from schnetpack_tpu.representation import PaiNN
        from schnetpack_tpu.transform.neighborlist import NeighborListTransform

        cutoff = 3.0
        n = len(pos)
        mol = {
            P.Z: np.full(n, 18, np.int64),
            P.R: pos,
            P.cell: cell,
            P.pbc: np.ones(3, bool) if cell is not None else np.zeros(3, bool),
        }
        pot = NeuralNetworkPotential(
            representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                                 cutoff=cutoff),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=P.energy, n_out=1, n_layers=2),
                            Forces()],
        )
        probe = dict(mol)
        if cell is None:
            probe[P.cell] = np.zeros((3, 3))
        probe = NeighborListTransform(cutoff)(probe)
        params = pot.init(jax.random.PRNGKey(0),
                          collate([probe], PaddingSpec(n + 8, 4096, 2)))
        system = load_molecules([{k: v for k, v in mol.items()
                                  if not (k == P.cell and v is None)}])
        system = MaxwellBoltzmannInit(40.0).initialize_system(
            system, jax.random.PRNGKey(1))
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.4,
                                    neighbor_list=neighbor_list)
        return system, calc

    def test_forces_match_dense(self):
        rng = np.random.RandomState(11)
        pos = rng.uniform(0, 9.0, size=(90, 3))
        cell = np.eye(3) * 9.0

        results = {}
        for mode in ("dense", "cellblock"):
            system, calc = self._build(mode, pos, cell)
            state = calc.init_state(system)
            out = calc.calculate(system, state)
            results[mode] = (np.asarray(out.forces[0]), np.asarray(out.energy))

        f_d, e_d = results["dense"]
        f_c, e_c = results["cellblock"]
        np.testing.assert_allclose(e_c, e_d, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f_c, f_d, rtol=1e-4, atol=1e-5)

    def test_nve_runs(self):
        from schnetpack_tpu.md import Simulator, VelocityVerlet

        rng = np.random.RandomState(13)
        pos = (np.mgrid[0:3, 0:3, 0:3].reshape(3, -1).T * 3.0 + 1.0
               + rng.uniform(-0.05, 0.05, (27, 3)))
        cell = np.eye(3) * 9.0
        system, calc = self._build("cellblock", pos, cell)
        sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False)
        sim.simulate(20, chunk_size=10)
        assert np.isfinite(np.asarray(sim.system.positions)).all()


class TestFusedMessageFM:
    """Feature-major geo kernel vs the edge-major XLA reference."""

    def test_fm_matches_xla_and_grads(self):
        from schnetpack_tpu.ops import cellblock as cb
        from schnetpack_tpu.ops.colblock import (
            _painn_message_xla, painn_message_columns_fm,
        )
        from schnetpack_tpu.ops.colblock import ColRefs

        old_impl, old_pieces = cb.IMPL, cb.PIECES
        cb.IMPL, cb.PIECES = "pallas_interpret", 3
        try:
            lay, R, _ = _layout(seed=8, n=90, L=10.0, cutoff=3.4)
            refs = ColRefs.from_layout(lay)
            Ap = len(lay.order)
            F = 32
            rng = np.random.RandomState(9)
            xmu = jnp.asarray(rng.randn(Ap, 6 * F), jnp.float32)
            rbf = jnp.asarray(rng.randn(*lay.emask.shape, 9), jnp.float32)
            rbf = rbf * jnp.asarray(lay.emask)[..., None]
            dirs = jnp.asarray(rng.randn(*lay.emask.shape, 3), jnp.float32)
            FW = jnp.asarray(rng.randn(9, 3 * F) * 0.3, jnp.float32)
            from schnetpack_tpu.ops.colblock_geo import concat_geo, split_geo

            geo = split_geo(jnp.concatenate(
                [jnp.moveaxis(rbf, -1, -2), jnp.moveaxis(dirs, -1, -2)],
                axis=2), refs.ksizes)

            def loss_fm(args):
                x, g, fw = args
                F3 = x.shape[1] // 2
                dq, dmu = painn_message_columns_fm(
                    x[:, :F3], x[:, F3:], g, fw, refs)
                return jnp.sum(jnp.sin(dq)) + jnp.sum(jnp.cos(dmu) * 0.5)

            def loss_ref(args):
                x, g, fw = args
                gm = jnp.moveaxis(concat_geo(g), 2, 3)
                dq, dmu = _painn_message_xla(x, gm[..., :9], gm[..., 9:],
                                             fw, refs)
                return jnp.sum(jnp.sin(dq)) + jnp.sum(jnp.cos(dmu) * 0.5)

            args = (xmu, geo, FW)
            v1, g1 = jax.value_and_grad(loss_fm)(args)
            cb.IMPL = "xla"
            v2, g2 = jax.value_and_grad(loss_ref)(args)
            np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
            g1 = (g1[0], concat_geo(g1[1]), g1[2])
            g2 = (g2[0], concat_geo(g2[1]), g2[2])
            for n, a, b in zip(["xmu", "geo", "FW"], g1, g2):
                np.testing.assert_allclose(
                    a, b, rtol=2e-4, atol=2e-4, err_msg=f"grad {n}")
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces


class TestFusedGeometry:
    """Fused geometry kernel (R -> geo) vs the XLA oracle, incl. VJP."""

    def test_geo_matches_xla_and_grad(self):
        from schnetpack_tpu.ops import colblock_geo as cg
        from schnetpack_tpu.ops.radial import gaussian_rbf_params

        old_impl, old_pieces = cb.IMPL, cb.PIECES
        cb.IMPL, cb.PIECES = "pallas_interpret", 3
        try:
            cutoff = 3.2
            lay, R, cell = _layout(seed=11, n=110, L=11.0, cutoff=3.6)
            refs = ColRefs.from_layout(lay)
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            coff_fm = jnp.asarray(
                np.moveaxis(lay.offcol, -1, 2), jnp.float32)
            centers, widths = gaussian_rbf_params(12, cutoff, 0.0)

            geo_k = cg.column_geometry(Rs, coff_fm, refs, centers, widths,
                                       cutoff)
            geo_x = cg.column_geometry_xla(Rs, coff_fm, refs, centers,
                                           widths, cutoff)
            assert isinstance(geo_k, tuple) and len(geo_k) == 9
            for pk, px in zip(geo_k, geo_x):
                np.testing.assert_allclose(pk, px, rtol=1e-5, atol=1e-6)

            g = tuple(
                jnp.asarray(np.random.RandomState(3 + i).randn(*p.shape),
                            jnp.float32)
                for i, p in enumerate(geo_k)
            )

            def loss_k(Rv):
                parts = cg.column_geometry(
                    Rv, coff_fm, refs, centers, widths, cutoff)
                return sum(jnp.sum(p * gi) for p, gi in zip(parts, g))

            def loss_x(Rv):
                parts = cg.column_geometry_xla(
                    Rv, coff_fm, refs, centers, widths, cutoff)
                return sum(jnp.sum(p * gi) for p, gi in zip(parts, g))

            dk = jax.grad(loss_k)(Rs)
            dx = jax.grad(loss_x)(Rs)
            np.testing.assert_allclose(dk, dx, rtol=1e-4, atol=1e-5)
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces

    def test_model_end_to_end_fused_geo(self):
        """PaiNN forces via the fused geometry path == the col_rij path."""
        from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
        from schnetpack_tpu.model import NeuralNetworkPotential
        from schnetpack_tpu.representation import PaiNN

        cutoff = 3.2
        lay, R, cell = _layout(seed=12, n=90, L=10.0, cutoff=3.6)
        nx, ny, Pc, ks = lay.dims
        Ap = nx * ny * Pc
        Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
            lay.slot_mask)[:, None]
        Z = jnp.asarray((np.full(len(R), 8)[lay.order]
                         * (lay.slot_mask > 0)).astype(np.int32))
        inputs = {
            P.Z: Z, P.R: Rs,
            P.idx_m: jnp.zeros(Ap, jnp.int32),
            P.atom_mask: jnp.asarray(lay.slot_mask, jnp.float32),
            P.n_atoms: jnp.asarray([len(R)]),
            P.cell: jnp.asarray(cell, jnp.float32)[None],
            P.pbc: jnp.ones((1, 3), bool),
            P.cell_qcol: jnp.asarray(lay.qcol),
            P.cell_dcol: jnp.asarray(lay.dcol),
            P.cell_coff: jnp.asarray(lay.offcol, jnp.float32),
            P.cell_emask: jnp.asarray(lay.emask, jnp.float32),
            P.cell_ksz: tuple(jnp.zeros((k,), jnp.int8) for k in ks),
            P.idx_i: jnp.zeros(1, jnp.int32),
            P.idx_j: jnp.zeros(1, jnp.int32),
            P.offsets: jnp.full((1, 3), 1e3, jnp.float32),
            P.pair_mask: jnp.zeros(1, jnp.float32),
            P.mol_mask: jnp.ones(1, jnp.float32),
        }
        pot = NeuralNetworkPotential(
            representation=PaiNN(n_atom_basis=16, n_interactions=2,
                                 n_rbf=8, cutoff=cutoff),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=P.energy), Forces()],
        )
        old_impl, old_pieces = cb.IMPL, cb.PIECES
        try:
            cb.IMPL = "xla"
            params = pot.init(jax.random.PRNGKey(0), dict(inputs))
            ref = pot.apply(params, dict(inputs))

            cb.IMPL, cb.PIECES = "pallas_interpret", 3
            inp2 = dict(inputs)
            inp2[P.cell_coff_fm] = jnp.asarray(
                np.moveaxis(lay.offcol, -1, 2), jnp.float32)
            out = pot.apply(params, inp2)
            np.testing.assert_allclose(
                out[P.energy], ref[P.energy], rtol=1e-5, atol=1e-5)
            fscale = float(jnp.max(jnp.abs(ref[P.forces])))
            np.testing.assert_allclose(
                out[P.forces] / fscale, ref[P.forces] / fscale,
                rtol=1e-4, atol=1e-4)
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces


class TestReplicaColumnPath:
    """Ring-polymer beads on the column fast path (union topology +
    vmap over beads) must match the dense path."""

    _build = TestMDParity._build

    def _build_replicas(self, neighbor_list, pos, cell, n_rep):
        from schnetpack_tpu.md import load_molecules

        system, calc = self._build(neighbor_list, pos, cell)
        mol = {
            P.Z: np.full(len(pos), 18, np.int64), P.R: pos,
            P.cell: cell, P.pbc: np.ones(3, bool),
        }
        system = load_molecules([mol], n_replicas=n_rep)
        # spread the beads a little so per-bead forces differ
        key = jax.random.PRNGKey(5)
        system = system.replace(
            positions=system.positions
            + jax.random.normal(key, system.positions.shape) * 0.03
        )
        return system, calc

    def test_rpmd_forces_match_dense(self):
        rng = np.random.RandomState(17)
        pos = rng.uniform(0, 9.0, size=(80, 3))
        cell = np.eye(3) * 9.0
        n_rep = 3

        results = {}
        for mode in ("dense", "cellblock"):
            system, calc = self._build_replicas(mode, pos, cell, n_rep)
            state = calc.init_state(system)
            out = calc.calculate(system, state)
            results[mode] = (np.asarray(out.forces), np.asarray(out.energy))

        f_d, e_d = results["dense"]
        f_c, e_c = results["cellblock"]
        assert f_c.shape == (n_rep, 80, 3)
        np.testing.assert_allclose(e_c, e_d, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f_c, f_d, rtol=1e-4, atol=1e-5)

    def test_rpmd_nve_runs_on_columns(self):
        from schnetpack_tpu.md import Simulator, VelocityVerlet

        rng = np.random.RandomState(19)
        pos = (np.mgrid[0:3, 0:3, 0:3].reshape(3, -1).T * 3.0 + 1.0
               + rng.uniform(-0.05, 0.05, (27, 3)))
        cell = np.eye(3) * 9.0
        system, calc = self._build_replicas("cellblock", pos, cell, 4)
        sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False)
        sim.simulate(10, chunk_size=5)
        assert np.isfinite(np.asarray(sim.system.positions)).all()


class TestFusedGeometryBackward:
    """The fused message+geometry backward (position cotangents straight
    out of the message kernel) must match the unfused composition
    (message bwd -> ggeo -> geometry bwd) to f32 roundoff."""

    def test_fused_bwd_matches_composition(self):
        from schnetpack_tpu.ops import colblock_geo as cg
        from schnetpack_tpu.ops.colblock import (
            painn_message_columns_fm, painn_message_columns_fm_fused,
        )
        from schnetpack_tpu.ops.radial import gaussian_rbf_params

        old_impl, old_pieces = cb.IMPL, cb.PIECES
        cb.IMPL, cb.PIECES = "pallas_interpret", 3
        try:
            rng = np.random.RandomState(0)
            R = rng.uniform(0, 10.0, (90, 3))
            cell = np.eye(3) * 10.0
            cutoff = 3.0
            lay = build_column_layout(R, 3.4, cell, np.ones(3, bool))
            refs = ColRefs.from_layout(lay)
            Ap = len(lay.order)
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            coff_fm = jnp.asarray(
                np.moveaxis(lay.offcol, -1, 2), jnp.float32)
            centers, widths = gaussian_rbf_params(12, cutoff, 0.0)
            cw = jnp.stack([
                jnp.asarray(centers, jnp.float32),
                -0.5 / jnp.square(jnp.asarray(widths, jnp.float32)),
            ], axis=1)
            F = 32
            x0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            mu0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            FW = jnp.asarray(rng.randn(13, 3 * F) * 0.3, jnp.float32)

            def loss_ref(args):
                x, mu, Rv, fw = args
                geo = cg.column_geometry(
                    Rv, coff_fm, refs, centers, widths, cutoff)
                dq, dmu = painn_message_columns_fm(x, mu, geo, fw, refs)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            def loss_fused(args):
                x, mu, Rv, fw = args
                geo = jax.lax.stop_gradient(cg.column_geometry(
                    Rv, coff_fm, refs, centers, widths, cutoff))
                dq, dmu = painn_message_columns_fm_fused(
                    x, mu, Rv, geo, fw, coff_fm, cw, refs, cutoff)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            from schnetpack_tpu.ops.colblock import (
                painn_message_columns_fm_geores,
                painn_message_columns_full_fused,
            )

            def loss_full(args):
                x, mu, Rv, fw = args
                dq, dmu = painn_message_columns_full_fused(
                    x, mu, Rv, fw, coff_fm, cw, refs, cutoff)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            def loss_geores(args):
                # geo-resident backward: geo carries the extra d channel
                x, mu, Rv, fw = args
                geo = jax.lax.stop_gradient(cg.column_geometry(
                    Rv, coff_fm, refs, centers, widths, cutoff,
                    with_d=True))
                dq, dmu = painn_message_columns_fm_geores(
                    x, mu, Rv, geo, fw, coff_fm, cw, refs, cutoff)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            def loss_geores_packed(args):
                # packed geo: ONE [nx, ny, nch, Ktot] tensor feeding both
                # the fwd message kernel and the geo-resident backward
                x, mu, Rv, fw = args
                geo = jax.lax.stop_gradient(cg.column_geometry_packed(
                    Rv, coff_fm, refs, centers, widths, cutoff,
                    with_d=True))
                dq, dmu = painn_message_columns_fm_geores(
                    x, mu, Rv, geo, fw, coff_fm, cw, refs, cutoff)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            args = (x0, mu0, Rs, FW)
            v1, g1 = jax.value_and_grad(loss_ref)(args)
            for loss_other in (loss_fused, loss_full, loss_geores,
                               loss_geores_packed):
                v2, g2 = jax.value_and_grad(loss_other)(args)
                np.testing.assert_allclose(v1, v2, rtol=1e-6)
                for n, a, b in zip(["x", "mu", "R", "FW"], g1, g2):
                    np.testing.assert_allclose(
                        a, b, rtol=1e-4, atol=1e-5, err_msg=f"grad {n}")
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces

    def test_wgrad_skip_md_mode(self):
        """With cellblock.WGRAD=False (MD calculators) the geo-resident
        backward must return identical x/mu/R cotangents and a zero FW
        cotangent — the gFW accumulation is the only thing skipped."""
        from schnetpack_tpu.ops import colblock_geo as cg
        from schnetpack_tpu.ops.colblock import (
            painn_message_columns_fm_geores,
        )
        from schnetpack_tpu.ops.radial import gaussian_rbf_params

        old = cb.IMPL, cb.PIECES, cb.WGRAD
        cb.IMPL, cb.PIECES = "pallas_interpret", 3
        try:
            rng = np.random.RandomState(3)
            R = rng.uniform(0, 10.0, (90, 3))
            cell = np.eye(3) * 10.0
            cutoff = 3.0
            lay = build_column_layout(R, 3.4, cell, np.ones(3, bool))
            refs = ColRefs.from_layout(lay)
            Ap = len(lay.order)
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            coff_fm = jnp.asarray(
                np.moveaxis(lay.offcol, -1, 2), jnp.float32)
            centers, widths = gaussian_rbf_params(12, cutoff, 0.0)
            cw = jnp.stack([
                jnp.asarray(centers, jnp.float32),
                -0.5 / jnp.square(jnp.asarray(widths, jnp.float32)),
            ], axis=1)
            F = 32
            x0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            mu0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            FW = jnp.asarray(rng.randn(13, 3 * F) * 0.3, jnp.float32)

            def loss(args):
                x, mu, Rv, fw = args
                geo = jax.lax.stop_gradient(cg.column_geometry(
                    Rv, coff_fm, refs, centers, widths, cutoff,
                    with_d=True))
                dq, dmu = painn_message_columns_fm_geores(
                    x, mu, Rv, geo, fw, coff_fm, cw, refs, cutoff)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            args = (x0, mu0, Rs, FW)
            cb.WGRAD = True
            v1, g1 = jax.value_and_grad(loss)(args)
            cb.WGRAD = False
            v2, g2 = jax.value_and_grad(loss)(args)
            np.testing.assert_allclose(v1, v2, rtol=1e-6)
            for n, a, b in zip(["x", "mu", "R"], g1, g2):
                np.testing.assert_allclose(
                    a, b, rtol=1e-5, atol=1e-6, err_msg=f"grad {n}")
            assert np.all(np.asarray(g2[3]) == 0.0), "gFW must be zero"
            assert np.any(np.asarray(g1[3]) != 0.0)
        finally:
            cb.IMPL, cb.PIECES, cb.WGRAD = old

    def test_full_fused_bf16_pieces(self):
        """The production bf16 (PIECES=1) and mixed (PIECES=2) feature
        modes must track the exact-f32 full-fused path within their
        documented error envelopes (geometry is exact-f32 in every
        mode)."""
        from schnetpack_tpu.ops.colblock import (
            painn_message_columns_full_fused,
        )
        from schnetpack_tpu.ops.radial import gaussian_rbf_params

        old_impl, old_pieces = cb.IMPL, cb.PIECES
        cb.IMPL = "pallas_interpret"
        try:
            rng = np.random.RandomState(1)
            R = rng.uniform(0, 10.0, (90, 3))
            cell = np.eye(3) * 10.0
            cutoff = 3.0
            lay = build_column_layout(R, 3.4, cell, np.ones(3, bool))
            refs = ColRefs.from_layout(lay)
            Ap = len(lay.order)
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            coff_fm = jnp.asarray(
                np.moveaxis(lay.offcol, -1, 2), jnp.float32)
            centers, widths = gaussian_rbf_params(12, cutoff, 0.0)
            cw = jnp.stack([
                jnp.asarray(centers, jnp.float32),
                -0.5 / jnp.square(jnp.asarray(widths, jnp.float32)),
            ], axis=1)
            F = 32
            x0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            mu0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            FW = jnp.asarray(rng.randn(13, 3 * F) * 0.3, jnp.float32)

            def grad_R(pieces):
                cb.PIECES = pieces

                def loss(Rv):
                    dq, dmu = painn_message_columns_full_fused(
                        x0, mu0, Rv, FW, coff_fm, cw, refs, cutoff)
                    return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

                return jax.grad(loss)(Rs)

            g3 = np.asarray(grad_R(3))
            scale = np.abs(g3).max() + 1e-9
            g2 = np.asarray(grad_R(2))
            g1 = np.asarray(grad_R(1))
            assert np.abs(g2 - g3).max() / scale < 5e-3
            assert np.abs(g1 - g3).max() / scale < 5e-2
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces


class TestPrecomputedOnehots:
    """ColRefs.oh: precomputed one-hot selection matrices must be
    bit-equivalent to the in-kernel VPU build (round-5 perf lever,
    scripts/kb_r5.py: fwd pass 1.21 -> 0.79 ms on v5e)."""

    def test_geores_preoh_matches_vpu_build(self):
        from schnetpack_tpu.ops import colblock_geo as cg
        from schnetpack_tpu.ops.colblock import (
            painn_message_columns_fm_geores,
        )
        from schnetpack_tpu.ops.radial import gaussian_rbf_params

        old_impl, old_pieces = cb.IMPL, cb.PIECES
        cb.IMPL, cb.PIECES = "pallas_interpret", 3
        try:
            rng = np.random.RandomState(5)
            R = rng.uniform(0, 10.0, (90, 3))
            cell = np.eye(3) * 10.0
            cutoff = 3.0
            lay = build_column_layout(R, 3.4, cell, np.ones(3, bool))
            refs = ColRefs.from_layout(lay)
            refs_oh = refs.with_onehots()
            assert refs_oh.oh is not None
            Ap = len(lay.order)
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            coff_fm = jnp.asarray(
                np.moveaxis(lay.offcol, -1, 2), jnp.float32)
            centers, widths = gaussian_rbf_params(12, cutoff, 0.0)
            cw = jnp.stack([
                jnp.asarray(centers, jnp.float32),
                -0.5 / jnp.square(jnp.asarray(widths, jnp.float32)),
            ], axis=1)
            F = 32
            x0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            mu0 = jnp.asarray(rng.randn(Ap, 3 * F) * 0.3, jnp.float32)
            FW = jnp.asarray(rng.randn(13, 3 * F) * 0.3, jnp.float32)

            def loss(args, use_refs):
                x, mu, Rv, fw = args
                geo = jax.lax.stop_gradient(cg.column_geometry_packed(
                    Rv, coff_fm, use_refs, centers, widths, cutoff,
                    with_d=True))
                dq, dmu = painn_message_columns_fm_geores(
                    x, mu, Rv, geo, fw, coff_fm, cw, use_refs, cutoff)
                return jnp.sum(jnp.sin(dq)) + 0.5 * jnp.sum(jnp.cos(dmu))

            args = (x0, mu0, Rs, FW)
            v1, g1 = jax.value_and_grad(lambda a: loss(a, refs))(args)
            v2, g2 = jax.value_and_grad(lambda a: loss(a, refs_oh))(args)
            np.testing.assert_allclose(v1, v2, rtol=0, atol=0)
            for n, a, b in zip(["x", "mu", "R", "FW"], g1, g2):
                np.testing.assert_allclose(
                    a, b, rtol=0, atol=0, err_msg=f"grad {n}")
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces
