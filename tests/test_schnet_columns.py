"""SchNet on the column fast path: fused cfconv kernel vs XLA oracle and
end-to-end parity with the flat-pair-list path."""
import jax
import jax.numpy as jnp
import numpy as np

from schnetpack_tpu import properties as P
from schnetpack_tpu.ops import cellblock as cb
from schnetpack_tpu.ops.cellblock import build_column_layout
from schnetpack_tpu.ops.colblock import ColRefs


def _layout(n=100, L=10.0, seed=0, cutoff=3.4):
    rng = np.random.RandomState(seed)
    R = rng.uniform(0, L, size=(n, 3))
    cell = np.eye(3) * L
    return build_column_layout(R, cutoff, cell, np.ones(3, bool)), R, cell


class TestCfconvKernel:
    def test_kernel_matches_xla_and_grads(self):
        from schnetpack_tpu.ops.schnet_columns import (
            _cfconv_xla, schnet_cfconv_columns,
        )

        old_impl, old_pieces = cb.IMPL, cb.PIECES
        cb.IMPL, cb.PIECES = "pallas_interpret", 3
        try:
            lay, R, _ = _layout(seed=21)
            refs = ColRefs.from_layout(lay)
            Ap = len(lay.order)
            F, B = 32, 8
            rng = np.random.RandomState(3)
            h = jnp.asarray(rng.randn(Ap, F), jnp.float32)
            # synthetic raw-phi geometry with a zeroed pad mask
            emask = jnp.asarray(lay.emask, jnp.float32)
            geo_e = rng.randn(*lay.emask.shape, B + 4).astype(np.float32)
            geo_e *= np.asarray(emask)[..., None]
            from schnetpack_tpu.ops.colblock_geo import split_geo

            geo = split_geo(jnp.moveaxis(jnp.asarray(geo_e), 3, 2),
                            refs.ksizes)
            W1 = jnp.asarray(rng.randn(B, F) * 0.3, jnp.float32)
            b1 = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
            W2 = jnp.asarray(rng.randn(F, F) * 0.2, jnp.float32)
            b2 = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)

            def loss_k(args):
                out = schnet_cfconv_columns(*args, refs)
                return jnp.sum(jnp.sin(out))

            def loss_x(args):
                out = _cfconv_xla(*args, refs)
                return jnp.sum(jnp.sin(out))

            args = (h, geo, W1, b1, W2, b2)
            v1, g1 = jax.value_and_grad(loss_k)(args)
            cb.IMPL = "xla"
            v2, g2 = jax.value_and_grad(loss_x)(args)
            np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)
            names = ["h", "geo", "W1", "b1", "W2", "b2"]
            for n, a, b in zip(names, g1, g2):
                for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                    np.testing.assert_allclose(pa, pb, rtol=2e-3, atol=2e-3,
                                               err_msg=f"grad {n}")
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces


class TestSchNetColumnModel:
    def test_forces_match_flat_path(self):
        from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
        from schnetpack_tpu.data.loader import PaddingSpec, collate
        from schnetpack_tpu.model import NeuralNetworkPotential
        from schnetpack_tpu.representation import SchNet
        from schnetpack_tpu.transform.neighborlist import NeighborListTransform

        cutoff = 3.0
        lay, R, cell = _layout(n=80, L=9.0, seed=23, cutoff=3.4)
        nx, ny, Pc, ks = lay.dims
        Ap = nx * ny * Pc
        pot = NeuralNetworkPotential(
            representation=SchNet(n_atom_basis=16, n_interactions=2,
                                  n_rbf=8, cutoff=cutoff),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=P.energy), Forces()],
        )
        # reference: flat pair list
        mol = {P.Z: np.full(len(R), 18, np.int64), P.R: R,
               P.cell: cell, P.pbc: np.ones(3, bool)}
        sample = NeighborListTransform(cutoff)(dict(mol))
        batch = collate([sample], PaddingSpec(len(R) + 8, 4096, 2))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        old_impl, old_pieces = cb.IMPL, cb.PIECES
        try:
            cb.IMPL = "xla"
            params = pot.init(jax.random.PRNGKey(0), dict(batch))
            ref = pot.apply(params, dict(batch))
            f_ref = np.asarray(ref[P.forces])[:len(R)]

            # column path, interpret-mode kernels
            cb.IMPL, cb.PIECES = "pallas_interpret", 3
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            Z = jnp.asarray((np.full(len(R), 18)[lay.order]
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
                P.cell_coff_fm: jnp.asarray(
                    np.moveaxis(lay.offcol, -1, 2), jnp.float32),
                P.cell_emask: jnp.asarray(lay.emask, jnp.float32),
                P.cell_ksz: tuple(jnp.zeros((k,), jnp.int8) for k in ks),
                P.idx_i: jnp.zeros(1, jnp.int32),
                P.idx_j: jnp.zeros(1, jnp.int32),
                P.offsets: jnp.full((1, 3), 1e3, jnp.float32),
                P.pair_mask: jnp.zeros(1, jnp.float32),
                P.mol_mask: jnp.ones(1, jnp.float32),
            }
            out = pot.apply(params, inputs)
            f_col = np.asarray(out[P.forces])[np.asarray(lay.rank)]
            e_ref = float(ref[P.energy][0])
            e_col = float(out[P.energy][0])
            assert abs(e_col - e_ref) < 1e-4 * max(1.0, abs(e_ref))
            scale = np.abs(f_ref).max()
            np.testing.assert_allclose(f_col / scale, f_ref / scale,
                                       rtol=1e-4, atol=1e-4)
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces


class TestTrainableRBFColumnPath:
    """VERDICT r4 #5: the column path with GaussianRBF(trainable=True)
    (reference nn/radial.py:18-49).  The geometry runs through the
    differentiable XLA path, so centers/widths receive real gradients
    through the cfconv kernels' ggeo cotangent."""

    def test_energy_and_rbf_grads_match_flat_path(self):
        from schnetpack_tpu.atomistic import Atomwise, PairwiseDistances
        from schnetpack_tpu.data.loader import PaddingSpec, collate
        from schnetpack_tpu.model import NeuralNetworkPotential
        from schnetpack_tpu.nn.radial import GaussianRBF
        from schnetpack_tpu.representation import SchNet
        from schnetpack_tpu.transform.neighborlist import NeighborListTransform

        cutoff = 3.0
        lay, R, cell = _layout(n=60, L=9.0, seed=29, cutoff=3.4)
        nx, ny, Pc, ks = lay.dims
        Ap = nx * ny * Pc
        pot = NeuralNetworkPotential(
            representation=SchNet(
                n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=cutoff,
                radial_basis=GaussianRBF(n_rbf=8, cutoff=cutoff,
                                         trainable=True)),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=P.energy)],
        )
        mol = {P.Z: np.full(len(R), 18, np.int64), P.R: R,
               P.cell: cell, P.pbc: np.ones(3, bool)}
        sample = NeighborListTransform(cutoff)(dict(mol))
        batch = collate([sample], PaddingSpec(len(R) + 8, 4096, 2))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        old_impl, old_pieces = cb.IMPL, cb.PIECES
        try:
            cb.IMPL = "xla"
            params = pot.init(jax.random.PRNGKey(0), dict(batch))
            rbf_path = ("params", "representation", "radial_basis")

            def e_flat(p):
                return pot.apply(p, dict(batch))[P.energy][0]

            g_ref = jax.grad(e_flat)(params)
            e_ref = float(e_flat(params))

            cb.IMPL, cb.PIECES = "pallas_interpret", 3
            Rs = jnp.asarray(R[lay.order], jnp.float32) * jnp.asarray(
                lay.slot_mask)[:, None]
            Z = jnp.asarray((np.full(len(R), 18)[lay.order]
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
                P.cell_coff_fm: jnp.asarray(
                    np.moveaxis(lay.offcol, -1, 2), jnp.float32),
                P.cell_emask: jnp.asarray(lay.emask, jnp.float32),
                P.cell_ksz: tuple(jnp.zeros((k,), jnp.int8) for k in ks),
                P.idx_i: jnp.zeros(1, jnp.int32),
                P.idx_j: jnp.zeros(1, jnp.int32),
                P.offsets: jnp.full((1, 3), 1e3, jnp.float32),
                P.pair_mask: jnp.zeros(1, jnp.float32),
                P.mol_mask: jnp.ones(1, jnp.float32),
            }

            def e_col(p):
                return pot.apply(p, inputs)[P.energy][0]

            e_c = float(e_col(params))
            g_col = jax.grad(e_col)(params)
            assert abs(e_c - e_ref) < 1e-4 * max(1.0, abs(e_ref))

            def leaf(tree, path):
                for k in path:
                    tree = tree[k]
                return tree

            for name in ("centers", "widths"):
                a = np.asarray(leaf(g_ref, rbf_path)[name])
                b = np.asarray(leaf(g_col, rbf_path)[name])
                assert np.abs(a).max() > 1e-6, f"flat {name} grad is zero"
                np.testing.assert_allclose(
                    b, a, rtol=1e-3, atol=1e-5 * np.abs(a).max())
        finally:
            cb.IMPL, cb.PIECES = old_impl, old_pieces
