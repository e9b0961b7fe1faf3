"""Long-range physics: Coulomb, Ewald (Madelung constant), ZBL, stress."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties, units
from schnetpack_tpu.atomistic import (
    Atomwise,
    EnergyCoulomb,
    EnergyEwald,
    Forces,
    PairwiseDistances,
    ZBLRepulsionEnergy,
)
from schnetpack_tpu.data.loader import PaddingSpec, collate, padding_for
from schnetpack_tpu.model import AtomisticCore, NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform


def _apply_core(core_modules, sample, spec=None, float_dtype=np.float64, extra=None):
    """Run a list of modules (as an AtomisticCore with dummy representation)."""

    class Identity:
        pass

    import flax.linen as nn

    class Rep(nn.Module):
        def __call__(self, inputs):
            return inputs

    core = AtomisticCore((PairwiseDistances(),), Rep(), tuple(core_modules))
    b = collate([sample], spec or padding_for([sample]), float_dtype=float_dtype)
    if extra:
        b.update(extra)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    params = core.init(jax.random.PRNGKey(0), b)
    return core.apply(params, b), b


def test_coulomb_two_charges():
    with jax.enable_x64():
        sample = {
            properties.Z: np.array([1, 1]),
            properties.R: np.array([[0.0, 0, 0], [2.0, 0, 0]]),
            properties.cell: np.zeros((3, 3)),
            properties.pbc: np.zeros(3, bool),
        }
        sample = NeighborListTransform(6.0)(sample)
        q = np.zeros(8)
        q[0], q[1] = 1.0, -1.0
        out, _ = _apply_core(
            [EnergyCoulomb()],
            sample,
            spec=PaddingSpec(8, 16, 2),
            extra={properties.partial_charges: q},
        )
        e = float(out["energy_coulomb"][0])
        assert e == pytest.approx(-units.ke / 2.0, rel=1e-10)


def test_ewald_madelung_nacl():
    """Ewald on rock salt must reproduce the Madelung constant 1.747565."""
    with jax.enable_x64():
        a = 5.64
        # conventional NaCl cell: Na at (0,0,0)+fcc, Cl at (1/2,0,0)+fcc
        fcc = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
        na = fcc * a
        cl = (fcc + [0.5, 0, 0]) % 1.0 * a
        R = np.concatenate([na, cl])
        charges = np.array([1.0] * 4 + [-1.0] * 4)
        sample = {
            properties.Z: np.array([11] * 4 + [17] * 4),
            properties.R: R,
            properties.cell: np.eye(3) * a,
            properties.pbc: np.ones(3, bool),
        }
        rc = 10.0
        sample = NeighborListTransform(rc, backend="brute")(sample)
        spec = padding_for([sample])
        q = np.zeros(spec.n_atoms)
        q[:8] = charges
        out, _ = _apply_core(
            [EnergyEwald(alpha=0.35, k_max=4, screening_cutoff=rc)],
            sample,
            spec=spec,
            extra={properties.partial_charges: q},
        )
        e_cell = float(out["energy_ewald"][0])
        # 8 ions -> 4 ion pairs; nearest-neighbor distance d = a/2
        madelung = -e_cell * (a / 2.0) / units.ke / 8 * 2
        assert madelung == pytest.approx(1.747565, rel=1e-4)


def test_zbl_repulsive_and_decaying():
    with jax.enable_x64():
        def zbl_at(dist):
            sample = {
                properties.Z: np.array([6, 6]),
                properties.R: np.array([[0.0, 0, 0], [dist, 0, 0]]),
                properties.cell: np.zeros((3, 3)),
                properties.pbc: np.zeros(3, bool),
            }
            sample = NeighborListTransform(5.0)(sample)
            out, _ = _apply_core(
                [ZBLRepulsionEnergy(trainable=False)], sample, spec=PaddingSpec(8, 16, 2)
            )
            return float(out["energy_zbl"][0])

        e1, e2, e3 = zbl_at(0.5), zbl_at(1.0), zbl_at(2.0)
        assert e1 > e2 > e3 > 0
        # screened: much less than bare Coulomb at 1 A
        assert e2 < units.ke * 36.0
        # at very short range approaches bare nuclear repulsion (phi -> 1)
        e_tiny = zbl_at(0.005)
        assert e_tiny == pytest.approx(units.ke * 36.0 / 0.005, rel=0.05)


def test_stress_matches_finite_difference():
    """sigma = (dE/deps)/V via Strain reparameterization vs numerical dE/deps."""
    with jax.enable_x64():
        a = 5.26
        pos = np.array(
            [[i * a, j * a, k * a] for i in range(2) for j in range(2) for k in range(2)]
        ) + np.random.RandomState(3).rand(8, 3) * 0.3
        cell = np.eye(3) * (2 * a)
        sample = {
            properties.Z: np.full(8, 18),
            properties.R: pos,
            properties.cell: cell,
            properties.pbc: np.ones(3, bool),
        }
        sample = NeighborListTransform(6.0)(sample)
        spec = padding_for([sample])

        pot = NeuralNetworkPotential(
            representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=6.0),
            input_modules=[PairwiseDistances()],
            output_modules=[
                Atomwise(output_key=properties.energy),
                Forces(calc_forces=True, calc_stress=True),
            ],
        )
        b = collate([sample], spec, float_dtype=np.float64)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        params = pot.init(jax.random.PRNGKey(0), b)
        params = jax.tree.map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        out = pot.apply(params, b)
        sigma = np.asarray(out[properties.stress][0])
        V = float(np.abs(np.linalg.det(cell)))

        # numerical dE/deps via explicit strain of positions+cell
        def energy_with_strain(eps):
            eps = np.asarray(eps)
            R2 = pos + pos @ eps
            C2 = cell + cell @ eps
            s2 = {
                properties.Z: np.full(8, 18),
                properties.R: R2,
                properties.cell: C2,
                properties.pbc: np.ones(3, bool),
            }
            s2 = NeighborListTransform(6.0)(s2)
            b2 = collate([s2], spec, float_dtype=np.float64)
            b2 = {k: jnp.asarray(v) for k, v in b2.items()}
            return float(pot.apply(params, b2)[properties.energy][0])

        h = 1e-6
        for (i, j) in [(0, 0), (1, 1), (0, 1)]:
            ep = np.zeros((3, 3)); ep[i, j] = h
            em = np.zeros((3, 3)); em[i, j] = -h
            # symmetrized FD to compare with symmetrized stress output
            fd = (energy_with_strain(ep) - energy_with_strain(em)) / (2 * h) / V
            ref = fd if i == j else None
            if i == j:
                assert sigma[i, j] == pytest.approx(fd, rel=1e-5, abs=1e-10)
            else:
                sym = 0.5 * (
                    (energy_with_strain(ep) - energy_with_strain(em)) / (2 * h)
                    + (energy_with_strain(ep.T) - energy_with_strain(em.T)) / (2 * h)
                ) / V
                assert sigma[i, j] == pytest.approx(sym, rel=1e-5, abs=1e-10)
