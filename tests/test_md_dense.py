"""Dense-layout MD fast-path coverage (VERDICT round-1 item #6).

Flat (all-pairs) and dense [A, K] layouts must agree for ring-polymer
replicas, and Ewald electrostatics must run inside the MD loop.
"""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.md import (
    MaxwellBoltzmannInit,
    RingPolymer,
    Simulator,
    VelocityVerlet,
    load_molecules,
)
from schnetpack_tpu.md.calculators import SchNetPackCalculator


def _argon_box(n_side=3, a=3.8, seed=0):
    rng = np.random.RandomState(seed)
    pos = (np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T * a
           + 0.8 + rng.uniform(-0.05, 0.05, (n_side ** 3, 3)))
    cell = np.eye(3) * (n_side * a)
    return pos, cell


def _potential(cutoff, with_ewald=False):
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    outputs = [Atomwise(output_key=P.energy, n_out=1, n_layers=2)]
    if with_ewald:
        from schnetpack_tpu.atomistic.electrostatic import EnergyEwald

        # alpha chosen so the erfc real-space tail is negligible beyond the
        # neighbor-list build cutoff (standard Ewald practice)
        outputs.append(EnergyEwald(alpha=1.0, output_key=P.energy,
                                   charges_key=P.partial_charges))
    outputs.append(Forces())
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                             cutoff=cutoff),
        input_modules=[PairwiseDistances()],
        output_modules=outputs,
    )
    rng = np.random.RandomState(1)
    probe = {
        P.Z: np.full(8, 18, np.int64), P.R: rng.rand(8, 3) * 4 + 0.5,
        P.cell: np.eye(3) * 8.0, P.pbc: np.ones(3, bool),
    }
    if with_ewald:
        probe[P.partial_charges] = rng.randn(8) * 0.1
    probe = NeighborListTransform(cutoff)(probe)
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(12, 512, 2)))
    return pot, params


@pytest.mark.parametrize("n_replicas", [1, 4])
def test_dense_matches_all_pairs_rpmd(n_replicas):
    cutoff = 3.5
    pos, cell = _argon_box()
    mol = {P.Z: np.full(len(pos), 18, np.int64), P.R: pos,
           P.cell: cell, P.pbc: np.ones(3, bool)}
    pot, params = _potential(cutoff)

    results = {}
    for mode in ("all_pairs", "dense"):
        system = load_molecules([mol], n_replicas=n_replicas)
        if n_replicas > 1:
            # spread the beads so per-bead neighborhoods genuinely differ
            rng = np.random.RandomState(7)
            disp = jnp.asarray(rng.randn(n_replicas, len(pos), 3) * 0.15,
                               system.positions.dtype)
            system = system.replace(positions=system.positions + disp)
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.6, neighbor_list=mode)
        state = calc.init_state(system)
        out = calc.calculate(system, state)
        results[mode] = (np.asarray(out.forces), np.asarray(out.energy))

    f_a, e_a = results["all_pairs"]
    f_d, e_d = results["dense"]
    np.testing.assert_allclose(e_d, e_a, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(f_d, f_a, rtol=1e-4, atol=1e-4)


def test_rpmd_nve_runs_on_dense():
    cutoff = 3.5
    pos, cell = _argon_box(seed=2)
    mol = {P.Z: np.full(len(pos), 18, np.int64), P.R: pos,
           P.cell: cell, P.pbc: np.ones(3, bool)}
    pot, params = _potential(cutoff)
    system = load_molecules([mol], n_replicas=4)
    system = MaxwellBoltzmannInit(30.0).initialize_system(
        system, jax.random.PRNGKey(3))
    calc = SchNetPackCalculator(pot, params, cutoff=cutoff, cutoff_shell=0.6,
                                neighbor_list="dense")
    sim = Simulator(system, RingPolymer(0.2, n_beads=4, temperature=30.0),
                    calc, progress=False)
    sim.simulate(20, chunk_size=10)
    assert np.isfinite(np.asarray(sim.system.positions)).all()


def test_ewald_in_md_dense_vs_flat():
    """Ewald electrostatics inside the MD loop, dense vs flat layout."""
    cutoff = 3.5
    pos, cell = _argon_box(seed=4)
    n = len(pos)
    rng = np.random.RandomState(5)
    q = rng.randn(n) * 0.2
    q -= q.mean()
    mol = {P.Z: np.full(n, 18, np.int64), P.R: pos,
           P.cell: cell, P.pbc: np.ones(3, bool)}
    pot, params = _potential(cutoff, with_ewald=True)

    results = {}
    for mode in ("all_pairs", "dense"):
        system = load_molecules([mol])
        calc = SchNetPackCalculator(
            pot, params, cutoff=cutoff, cutoff_shell=0.6, neighbor_list=mode,
            required_properties=[],
        )
        state = calc.init_state(system)
        inputs = calc._model_inputs(system, state)
        inputs[P.partial_charges] = jnp.asarray(q, inputs[P.R].dtype)
        out = pot.apply(params, inputs, do_postprocessing=False)
        results[mode] = (np.asarray(out[P.forces]), np.asarray(out[P.energy]))

    f_a, e_a = results["all_pairs"]
    f_d, e_d = results["dense"]
    np.testing.assert_allclose(e_d, e_a, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(f_d, f_a, rtol=1e-4, atol=1e-4)


def test_field_schnet_dense_matches_flat():
    """FieldSchNet over the dense [A, K] MD layout == flat layout."""
    from schnetpack_tpu.atomistic import (
        Atomwise, Forces, PairwiseDistances, StaticExternalFields,
    )
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import FieldSchNet
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    cutoff = 3.5
    pos, cell = _argon_box(seed=6)
    mol = {P.Z: np.full(len(pos), 18, np.int64), P.R: pos,
           P.cell: cell, P.pbc: np.ones(3, bool)}
    pot = NeuralNetworkPotential(
        representation=FieldSchNet(n_atom_basis=16, n_interactions=2,
                                   n_rbf=8, cutoff=cutoff),
        input_modules=[PairwiseDistances(),
                       StaticExternalFields(
                           required_fields=[P.electric_field])],
        output_modules=[Atomwise(output_key=P.energy, n_out=1, n_layers=2),
                        Forces()],
    )
    rng = np.random.RandomState(1)
    probe = {
        P.Z: np.full(8, 18, np.int64), P.R: rng.rand(8, 3) * 4 + 0.5,
        P.cell: np.eye(3) * 8.0, P.pbc: np.ones(3, bool),
    }
    probe = NeighborListTransform(cutoff)(probe)
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(12, 512, 2)))

    results = {}
    for mode in ("all_pairs", "dense"):
        system = load_molecules([mol])
        calc = SchNetPackCalculator(pot, params, cutoff=cutoff,
                                    cutoff_shell=0.6, neighbor_list=mode)
        state = calc.init_state(system)
        out = calc.calculate(system, state)
        results[mode] = (np.asarray(out.forces), np.asarray(out.energy))

    f_a, e_a = results["all_pairs"]
    f_d, e_d = results["dense"]
    np.testing.assert_allclose(e_d, e_a, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(f_d, f_a, rtol=1e-4, atol=1e-4)
