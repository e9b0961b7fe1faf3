"""Cell-blocked neighbor layout: selection-gather vs take, MD parity.

The cellblock path (ops/cellblock.py) must reproduce the dense [A, K]
layout bit-for-bit in structure (same neighbors, same offsets) and to
selection-matmul precision in values.
"""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.ops.cellblock import (
    OFFSETS,
    build_cell_layout,
    cell_gather,
)


def _random_box(n=120, L=12.0, seed=0):
    rng = np.random.RandomState(seed)
    R = rng.uniform(0, L, size=(n, 3))
    cell = np.eye(3) * L
    return R, cell


class TestLayout:
    def test_qidx_decodes_to_global_neighbor(self):
        R, cell = _random_box()
        lay = build_cell_layout(R, 3.5, cell, np.ones(3, bool))
        nx, ny, nz, C, K = lay.dims
        qidx = lay.qidx.reshape(-1, C, K)
        coords = np.stack(np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        ), -1).reshape(-1, 3)
        for c in range(qidx.shape[0]):
            for s in range(C):
                for k in range(K):
                    q = qidx[c, s, k]
                    if q < 0:
                        assert lay.nbh_mask.reshape(-1, C, K)[c, s, k] == 0
                        continue
                    o, sj = divmod(q, C)
                    nb = (coords[c] + OFFSETS[o]) % [nx, ny, nz]
                    nb_cell = (nb[0] * ny + nb[1]) * nz + nb[2]
                    assert lay.nbh_idx.reshape(-1, C, K)[c, s, k] == nb_cell * C + sj

    def test_edges_match_brute_force(self):
        from schnetpack_tpu.transform.neighborlist import neighbor_list

        R, cell = _random_box(n=80, L=10.0, seed=1)
        cutoff = 3.2
        lay = build_cell_layout(R, cutoff, cell, np.ones(3, bool))
        ii, jj, S = neighbor_list(R, cutoff, cell, np.ones(3, bool))
        # reconstruct edge set from the layout
        mask = lay.nbh_mask > 0
        i_s = np.repeat(np.arange(lay.nbh_idx.shape[0]), lay.nbh_idx.shape[1])
        i_s = i_s.reshape(lay.nbh_idx.shape)[mask]
        j_s = lay.nbh_idx[mask]
        off = lay.nbh_offsets[mask]
        got = sorted(
            (int(lay.order[a]), int(lay.order[b]), *np.round(o, 4))
            for a, b, o in zip(i_s, j_s, off)
        )
        off_ref = S @ cell
        want = sorted(
            (int(a), int(b), *np.round(o, 4)) for a, b, o in zip(ii, jj, off_ref)
        )
        assert got == want

    def test_nonperiodic_molecule(self):
        rng = np.random.RandomState(3)
        R = rng.uniform(0, 6.0, size=(20, 3))
        lay = build_cell_layout(R, 2.5)
        # degree sanity: every close pair is present
        from scipy.spatial.distance import cdist  # noqa: F401 — optional
        d = np.linalg.norm(R[:, None] - R[None, :], axis=-1)
        np.fill_diagonal(d, 1e9)
        n_edges = (d < 2.5).sum()
        assert int(lay.nbh_mask.sum()) == n_edges
        assert np.allclose(lay.nbh_offsets, 0)


class TestCellGather:
    @pytest.mark.parametrize("seed", [0, 7])
    def test_matches_take(self, seed):
        R, cell = _random_box(seed=seed)
        lay = build_cell_layout(R, 3.5, cell, np.ones(3, bool))
        Ap = lay.nbh_idx.shape[0]
        table = jnp.asarray(np.random.RandomState(seed).randn(Ap, 16), jnp.float32)
        qidx = jnp.asarray(lay.qidx)
        out = cell_gather(table, qidx)
        ref = jnp.take(table, jnp.asarray(lay.nbh_idx), axis=0)
        ref = ref * jnp.asarray(lay.nbh_mask)[..., None]
        np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-6)

    def test_vjp_matches_take(self):
        R, cell = _random_box(seed=2)
        lay = build_cell_layout(R, 3.5, cell, np.ones(3, bool))
        Ap = lay.nbh_idx.shape[0]
        rng = np.random.RandomState(5)
        table = jnp.asarray(rng.randn(Ap, 8), jnp.float32)
        w = jnp.asarray(rng.randn(Ap, lay.nbh_idx.shape[1], 8), jnp.float32)
        qidx = jnp.asarray(lay.qidx)
        nbh = jnp.asarray(lay.nbh_idx)
        m = jnp.asarray(lay.nbh_mask)

        def f_cell(t):
            return jnp.sum(cell_gather(t, qidx) * w)

        def f_take(t):
            return jnp.sum(jnp.take(t, nbh, axis=0) * m[..., None] * w)

        g1 = jax.grad(f_cell)(table)
        g2 = jax.grad(f_take)(table)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)


class TestPallasKernel:
    """Interpret-mode equivalence of the fused kernels vs the XLA path."""

    def _layout(self, seed=4):
        R, cell = _random_box(n=100, L=10.0, seed=seed)
        return build_cell_layout(R, 3.4, cell, np.ones(3, bool))

    def test_fwd_matches_xla(self):
        from schnetpack_tpu.ops.cellblock_pallas import cell_gather_fwd_pallas

        lay = self._layout()
        Ap = lay.nbh_idx.shape[0]
        table = jnp.asarray(np.random.RandomState(0).randn(Ap, 128), jnp.float32)
        qidx = jnp.asarray(lay.qidx)
        out = cell_gather_fwd_pallas(table, qidx, pieces=3, interpret=True)
        ref = jnp.take(table, jnp.asarray(lay.nbh_idx), axis=0)
        ref = ref * jnp.asarray(lay.nbh_mask)[..., None]
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_bwd_matches_xla(self):
        from schnetpack_tpu.ops.cellblock_pallas import cell_gather_bwd_pallas

        lay = self._layout(seed=6)
        Ap, K = lay.nbh_idx.shape
        g = jnp.asarray(np.random.RandomState(1).randn(Ap, K, 128), jnp.float32)
        g = g * jnp.asarray(lay.nbh_mask)[..., None]
        qidx = jnp.asarray(lay.qidx)
        dT = cell_gather_bwd_pallas(g, qidx, pieces=3, interpret=True)
        # reference: dT[j] = sum of g over edges pointing at j
        ref = np.zeros((Ap, 128), np.float32)
        np.add.at(ref, lay.nbh_idx.reshape(-1),
                  np.asarray(g).reshape(-1, 128))
        np.testing.assert_allclose(dT, ref, rtol=1e-5, atol=1e-5)


class TestFusedMessage:
    """Fused PaiNN message kernel vs the XLA composition, incl. grads."""

    def test_fused_matches_xla_and_grads(self, monkeypatch):
        from schnetpack_tpu.ops import cellblock as cb
        from schnetpack_tpu.ops import painn_fused as pf

        R, cell = _random_box(n=90, L=10.0, seed=8)
        lay = build_cell_layout(R, 3.4, cell, np.ones(3, bool))
        Ap, K = lay.nbh_idx.shape
        F = 32
        rng = np.random.RandomState(9)
        xmu = jnp.asarray(rng.randn(Ap, 6 * F), jnp.float32)
        rbf = jnp.asarray(rng.randn(Ap, K, 9), jnp.float32)
        rbf = rbf * jnp.asarray(lay.nbh_mask)[..., None]
        dirs = jnp.asarray(rng.randn(Ap, K, 3), jnp.float32)
        FW = jnp.asarray(rng.randn(9, 3 * F) * 0.3, jnp.float32)
        qidx = jnp.asarray(lay.qidx)

        monkeypatch.setattr(cb, "PIECES", 3)  # exact selection

        def loss(args, fused):
            monkeypatch.setattr(cb, "IMPL", "pallas_interpret" if fused else "xla")
            x, rb, dr, fw = args
            if fused:
                dq, dmu = pf._message_fused(x, rb, dr, fw, qidx)
            else:
                dq, dmu = pf._message_xla(x, rb, dr, fw, qidx)
            return jnp.sum(jnp.sin(dq)) + jnp.sum(jnp.cos(dmu) * 0.5)

        args = (xmu, rbf, dirs, FW)
        v1, g1 = jax.value_and_grad(lambda a: loss(a, True))(args)
        v2, g2 = jax.value_and_grad(lambda a: loss(a, False))(args)
        np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
        names = ["xmu", "rbf", "dir", "FW"]
        for n, a, b in zip(names, g1, g2):
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=2e-4, err_msg=f"grad {n}"
            )


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
        for mode in ("dense", "cellblock_atom"):
            system, calc = self._build(mode, pos, cell)
            state = calc.init_state(system)
            out = calc.calculate(system, state)
            results[mode] = (np.asarray(out.forces[0]), np.asarray(out.energy))

        f_d, e_d = results["dense"]
        f_c, e_c = results["cellblock_atom"]
        np.testing.assert_allclose(e_c, e_d, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f_c, f_d, rtol=1e-4, atol=1e-5)

    def test_nve_runs_and_conserves(self):
        from schnetpack_tpu.md import Simulator, VelocityVerlet

        rng = np.random.RandomState(13)
        # loose gas-like box so forces are gentle
        pos = (np.mgrid[0:3, 0:3, 0:3].reshape(3, -1).T * 3.0 + 1.0
               + rng.uniform(-0.05, 0.05, (27, 3)))
        cell = np.eye(3) * 9.0
        system, calc = self._build("cellblock_atom", pos, cell)
        sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False)
        sim.simulate(20, chunk_size=10)
        assert np.isfinite(np.asarray(sim.system.positions)).all()
