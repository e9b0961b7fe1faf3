"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config route
# works as long as it happens before backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from schnetpack_tpu import properties


@pytest.fixture(autouse=True)
def _reset_kernel_wgrad():
    """MD calculators flip the process-global WGRAD off (they only need
    position gradients); tests that jit param-grads through the column
    kernels must not inherit that from an earlier test."""
    from schnetpack_tpu.ops import cellblock as _cb

    _cb.WGRAD = True
    yield
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.transform.neighborlist import NeighborListTransform


def random_molecule(rng: np.random.RandomState, n_atoms: int, cutoff: float = 5.0):
    """A random, reasonably-spread molecule sample with a neighbor list."""
    sample = {
        properties.Z: rng.randint(1, 9, size=n_atoms).astype(np.int64),
        properties.R: (rng.rand(n_atoms, 3) * 4.0).astype(np.float64),
        properties.cell: np.zeros((3, 3)),
        properties.pbc: np.zeros(3, bool),
    }
    return NeighborListTransform(cutoff)(sample)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def molecule_batch(rng):
    """4 random molecules collated into one padded batch."""
    samples = [random_molecule(rng, n) for n in (5, 8, 3, 11)]
    return collate(samples, PaddingSpec(n_atoms=48, n_pairs=512, n_molecules=6))


@pytest.fixture(scope="session")
def argon_crystal():
    """Simple-cubic argon: every atom has exactly 6 first-shell neighbors."""
    a = 5.26
    reps = 2
    pos = np.array(
        [[i * a, j * a, k * a] for i in range(reps) for j in range(reps) for k in range(reps)]
    )
    cell = np.eye(3) * (a * reps)
    return {
        properties.Z: np.full(len(pos), 18, dtype=np.int64),
        properties.R: pos,
        properties.cell: cell,
        properties.pbc: np.ones(3, bool),
    }
