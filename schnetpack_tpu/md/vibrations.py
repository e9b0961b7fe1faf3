"""Harmonic vibrational analysis from the analytic response Hessian.

Complements the trajectory-based spectra (``md/data/spectra.py``) and the
finite-difference normal modes in ``AseInterface`` with exact second
derivatives from the response engine (one ``jacrev(grad)`` pass).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .. import properties as P
from ..transform.atomistic import ATOMIC_MASSES
from ..units import hbar, invcm


def normal_modes(
    pot,
    params,
    mol: Dict[str, np.ndarray],
    cutoff: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Harmonic frequencies [cm^-1] and mass-weighted mode vectors.

    ``pot`` must include a ``Response`` spec with ``hessian`` in its
    response properties (or one is added on the fly).
    """
    import jax
    import jax.numpy as jnp

    from ..atomistic import Atomwise, PairwiseDistances, Response
    from ..data.loader import PaddingSpec, collate, round_up
    from ..model import NeuralNetworkPotential
    from ..transform.neighborlist import NeighborListTransform

    props = set()
    for s in pot.response_specs:
        props.update(s.response_properties)
    if P.hessian not in props:
        pot = NeuralNetworkPotential(
            representation=pot.core.representation,
            input_modules=list(pot.core.input_modules),
            output_modules=list(pot.core.output_modules)
            + [Response(response_properties=[P.hessian])],
            postprocessors=pot.postprocessors,
            do_postprocessing=False,
        )

    rc = cutoff or getattr(pot.core.representation, "cutoff", 5.0)
    n = len(mol[P.Z])
    sample = NeighborListTransform(rc)(dict(mol))
    spec = PaddingSpec(
        n_atoms=round_up(n + 1, 8),
        n_pairs=round_up(max(len(sample[P.idx_i]), 1), 64),
        n_molecules=2,
    )
    batch = collate([sample], spec)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = pot.apply(params, batch)
    # per-molecule block form [M, Amax, 3, Amax, 3]; molecule 0 is ours
    Hb = np.asarray(out[P.hessian])[0]
    amax = Hb.shape[0]
    H = Hb.reshape(amax * 3, amax * 3)[: 3 * n, : 3 * n]
    H = 0.5 * (H + H.T)

    m = ATOMIC_MASSES[np.asarray(mol[P.Z])]
    minv = 1.0 / np.sqrt(np.repeat(m, 3))
    Hw = H * minv[:, None] * minv[None, :]
    w2, vecs = np.linalg.eigh(Hw)
    freqs = np.sign(w2) * np.sqrt(np.abs(w2)) * hbar / invcm
    return freqs, vecs
