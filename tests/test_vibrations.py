"""Analytic-Hessian normal modes vs finite-difference normal modes."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.interfaces import AseInterface, SpkCalculator
from schnetpack_tpu.md.vibrations import normal_modes
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform


def test_analytic_vs_fd_normal_modes(rng):
    import jax.numpy as jnp

    with jax.enable_x64():
        pot = NeuralNetworkPotential(
            representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=5.0),
            input_modules=[PairwiseDistances()],
            output_modules=[Atomwise(output_key="energy"), Forces()],
        )
        mol = {
            P.Z: np.array([8, 1, 1]),
            P.R: np.array([[0.0, 0, 0], [0.96, 0.3, 0], [-0.9, 0.4, 0.1]]),
            P.cell: np.zeros((3, 3)),
            P.pbc: np.zeros(3, bool),
        }
        s = NeighborListTransform(5.0)(dict(mol))
        b = collate([s], PaddingSpec(8, 32, 2), float_dtype=np.float64)
        params = pot.init(jax.random.PRNGKey(0), b)
        params = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params,
        )

        freqs, vecs = normal_modes(pot, params, mol)
        assert freqs.shape == (9,)
        assert vecs.shape == (9, 9)
        assert np.isfinite(freqs).all()

        calc = SpkCalculator(pot, params, cutoff=5.0, dtype=np.float64)
        iface = AseInterface(mol, calc)
        fd = iface.compute_normal_modes(delta=1e-3)
        np.testing.assert_allclose(np.sort(freqs), np.sort(fd), rtol=5e-3, atol=1.0)
