"""Scale-aware response derivatives (VERDICT r3 #4).

Batched molecules never couple, so the second-derivative responses must
be computed as per-molecule blocks (HVPs with all-molecule tangents) —
no [M, 3, M, 3] cross-molecule jacobian may appear anywhere in the
compiled program.  Checks both the numerics (finite differences over the
external field) and the jaxpr (no M-squared intermediate).
"""
import jax
import jax.numpy as jnp
import numpy as np

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, PairwiseDistances, Response
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import FieldSchNet
from tests.conftest import random_molecule

CUTOFF = 5.0
# padded molecule count chosen so (M, 3, M, 3) is an unmistakable shape
SPEC = PaddingSpec(n_atoms=24, n_pairs=256, n_molecules=5)


def _build(rng):
    pot = NeuralNetworkPotential(
        representation=FieldSchNet(
            n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF,
            response_properties=[P.dipole_moment, P.polarizability],
        ),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=P.energy),
            Response(response_properties=[
                P.forces, P.dipole_moment, P.polarizability,
                P.partial_charges,
            ]),
        ],
    )
    mols = [random_molecule(rng, 5), random_molecule(rng, 6)]
    b = {k: jnp.asarray(v) for k, v in collate(mols, SPEC).items()}
    params = pot.init(jax.random.PRNGKey(0), b)
    return pot, params, b


def _shapes_in_jaxpr(jaxpr, acc):
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            aval = getattr(v, "aval", None)
            if aval is not None and hasattr(aval, "shape"):
                acc.add(tuple(aval.shape))
        for sub in jax.core.subjaxprs(eqn.jaxpr) if hasattr(eqn, "jaxpr") else ():
            _shapes_in_jaxpr(sub, acc)
        for param in eqn.params.values():
            closed = getattr(param, "jaxpr", None)
            if closed is not None:
                _shapes_in_jaxpr(closed, acc)
            if isinstance(param, (list, tuple)):
                for p in param:
                    closed = getattr(p, "jaxpr", None)
                    if closed is not None:
                        _shapes_in_jaxpr(closed, acc)
    return acc


def test_no_cross_molecule_jacobian_in_jaxpr(rng):
    pot, params, b = _build(rng)
    M = int(b[P.n_atoms].shape[0])
    assert M == 5
    jaxpr = jax.make_jaxpr(lambda p, i: pot.apply(p, i))(params, b)
    shapes = _shapes_in_jaxpr(jaxpr.jaxpr, set())
    forbidden = (M, 3, M, 3)
    assert forbidden not in shapes, (
        "dense cross-molecule [M,3,M,3] jacobian found in the program"
    )
    # the per-molecule blocked output shape IS present
    out = pot.apply(params, b)
    assert out[P.polarizability].shape == (M, 3, 3)


def test_polarizability_matches_finite_difference(rng):
    """alpha from the HVP path == -d(dE/dF)/dF by central differences on
    the external field, independently for both real molecules."""
    pot, params, b = _build(rng)
    M = int(b[P.n_atoms].shape[0])
    out0 = pot.apply(params, b)
    alpha = np.asarray(out0[P.polarizability])

    h = 1e-3
    fd = np.zeros((M, 3, 3))
    for i in range(3):
        for sgn in (+1, -1):
            bb = dict(b)
            F = np.zeros((M, 3))
            F[:, i] = sgn * h
            bb[P.electric_field] = jnp.asarray(F)
            mu = np.asarray(pot.apply(params, bb)[P.dipole_moment])
            fd[:, :, i] += sgn * mu / (2 * h)
    # alpha = d mu / d F.  atol covers the f32 central-difference noise
    # floor: mu carries ~1e-7 relative eval noise, divided by 2h = 2e-3
    # -> ~5e-5 absolute on fd; 1e-5 was a 3-sigma flake (seen r5: one of
    # 18 elements at 1.5e-4 abs / 0.3% rel on a ~0.05 element).
    np.testing.assert_allclose(alpha[:2], fd[:2], rtol=2e-3, atol=5e-4)
    # symmetric per molecule
    np.testing.assert_allclose(
        alpha[:2], np.swapaxes(alpha[:2], 1, 2), rtol=1e-3, atol=1e-6
    )


def test_partial_charges_match_dipole_derivative_trace(rng):
    """q_a from the HVP path equals tr(d mu / d R_a)/3 from the full
    [M,3,A,3] jacobian (the dense reference form, built only here in the
    test)."""
    pot, params, b = _build(rng)
    out = pot.apply(params, b)
    q = np.asarray(out[P.partial_charges])

    # dense reference: jacobian of the dipole output over positions
    def mu_of_R(R_):
        bb = dict(b)
        bb[P.R] = R_
        return pot.apply(params, bb)[P.dipole_moment]

    dmu_dR = np.asarray(jax.jacrev(mu_of_R)(b[P.R]))  # [M,3,A,3]
    idx_m = np.asarray(b[P.idx_m]).astype(int)
    A = dmu_dR.shape[2]
    q_ref = np.zeros(A)
    for a in range(A):
        q_ref[a] = np.trace(dmu_dR[idx_m[a], :, a, :]) / 3.0
    mask = np.asarray(b[P.atom_mask]) if P.atom_mask in b else np.ones(A)
    np.testing.assert_allclose(q, q_ref * mask, rtol=1e-4, atol=1e-7)


def test_hessian_blocked_two_molecule_batch(rng):
    """VERDICT r4 #8: the Hessian comes out in per-molecule block form
    [M, Amax, 3, Amax, 3] (no dense [A,3,A,3] cross-molecule tensor) and
    each molecule's block matches the dense jacrev reference computed
    in-test; cross-molecule entries of that dense reference are zero."""
    import jax
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import (
        Atomwise, PairwiseDistances, Response,
    )
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import SchNet
    from tests.conftest import random_molecule

    with jax.enable_x64():
        pot = NeuralNetworkPotential(
            representation=SchNet(n_atom_basis=8, n_interactions=1,
                                  n_rbf=6, cutoff=5.0),
            input_modules=[PairwiseDistances()],
            output_modules=[
                Atomwise(output_key=P.energy),
                Response(response_properties=[P.hessian]),
            ],
        )
        mols = [random_molecule(rng, 3), random_molecule(rng, 5)]
        b = collate(mols, PaddingSpec(16, 128, 3), float_dtype=np.float64)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        params = pot.init(jax.random.PRNGKey(0), b)
        out = pot.apply(params, b)
        Hb = np.asarray(out[P.hessian])
        # block form: M=3 (2 real + padding), Amax = 5
        assert Hb.shape == (3, 5, 3, 5, 3)
        np.testing.assert_allclose(Hb[2], 0.0, atol=1e-12)

        # dense jacrev reference over the whole padded batch
        def energy(R):
            bb = dict(b)
            bb[P.R] = R
            return pot.apply(params, bb, do_postprocessing=False)[P.energy][:2].sum()

        Hd = np.asarray(jax.jacfwd(jax.grad(energy))(b[P.R]))  # [A,3,A,3]
        # cross-molecule entries of the dense reference are zero
        np.testing.assert_allclose(Hd[:3, :, 3:8], 0.0, atol=1e-10)
        # per-molecule blocks match the dense diagonal blocks
        np.testing.assert_allclose(Hb[0, :3, :, :3], Hd[:3, :, :3],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(Hb[1, :5, :, :5], Hd[3:8, :, 3:8],
                                   rtol=1e-8, atol=1e-10)
        # padded slots in the blocks are masked
        np.testing.assert_allclose(Hb[0, 3:], 0.0, atol=1e-12)
