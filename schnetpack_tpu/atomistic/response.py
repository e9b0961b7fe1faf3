"""Response properties via functional differentiation.

The reference computes forces/stress/higher-order responses with chains of
``torch.autograd.grad`` calls inside output modules
(``src/schnetpack/atomistic/response.py``).  Here the idiomatic-JAX design
is used instead: ``Forces`` / ``Response`` are declarative *specs*; the
``NeuralNetworkPotential`` (model/base.py) builds one pure energy closure
and composes ``jax.grad`` / ``jax.jacrev`` around it.  This gives exact
parity of outputs with much better XLA memory behavior than per-output grad
loops (reference ``nn/utils.py:21-126``).

``Strain`` is the input module making stress differentiable: it
reparameterizes positions/offsets/cell by a symmetric per-molecule strain
``eps`` so that ``stress = (dE/deps) / V`` (reference ``response.py:434-464``).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import properties


class Strain(nn.Module):
    """Applies ``x -> x + x @ eps`` to positions, offsets and cells when a
    strain tensor is present in the inputs (injected by the response engine)."""

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        if properties.strain not in inputs:
            return inputs
        eps = inputs[properties.strain]  # [M, 3, 3]
        idx_m = inputs[properties.idx_m]
        R = inputs[properties.R]
        eps_atom = jnp.take(eps, idx_m, axis=0)  # [A, 3, 3]
        inputs[properties.R] = R + jnp.einsum("ai,aij->aj", R, eps_atom)
        cell = inputs[properties.cell]
        inputs[properties.cell] = cell + jnp.einsum("mki,mij->mkj", cell, eps)
        for off_key, i_key in (
            (properties.offsets, properties.idx_i),
            (properties.offsets_lr, properties.idx_i_lr),
        ):
            if off_key in inputs:
                off = inputs[off_key]
                pair_mol = jnp.take(idx_m, inputs[i_key], axis=0)
                eps_pair = jnp.take(eps, pair_mol, axis=0)
                inputs[off_key] = off + jnp.einsum("pi,pij->pj", off, eps_pair)
        if properties.nbh_offsets in inputs:
            # dense layout: [A, K, 3] offsets strained by the center atom's
            # molecule tensor
            noff = inputs[properties.nbh_offsets]
            inputs[properties.nbh_offsets] = noff + jnp.einsum(
                "aki,aij->akj", noff, eps_atom
            )
        return inputs


class StaticExternalFields(nn.Module):
    """Injects zero-valued external field tensors required by requested
    response properties (parity: ``atomistic/external_fields.py:12-59``).
    The response engine replaces them with differentiable primals.

    Either name the fields directly (``required_fields``) or, like the
    reference, pass ``response_properties`` and let the required fields be
    derived from :data:`properties.required_external_fields`.
    """

    required_fields: Sequence[str] = ()
    response_properties: Optional[Sequence[str]] = None

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        M = inputs[properties.n_atoms].shape[0]
        dtype = inputs[properties.R].dtype
        fields = list(self.required_fields)
        for p in self.response_properties or ():
            for f in properties.required_external_fields.get(p, []):
                if f not in fields:
                    fields.append(f)
        for field in fields:
            if field not in inputs:
                inputs[field] = jnp.zeros((M, 3), dtype=dtype)
        if properties.magnetic_field in fields:
            A = inputs[properties.Z].shape[0]
            if properties.nuclear_magnetic_moments not in inputs:
                inputs[properties.nuclear_magnetic_moments] = jnp.zeros((A, 3), dtype=dtype)
        return inputs


@dataclasses.dataclass
class Forces:
    """Spec: compute forces (and optionally stress) from an energy head
    (parity: ``response.py:18-92``)."""

    calc_forces: bool = True
    calc_stress: bool = False
    energy_key: str = properties.energy
    force_key: str = properties.forces
    stress_key: str = properties.stress

    @property
    def response_properties(self) -> List[str]:
        out = []
        if self.calc_forces:
            out.append(properties.forces)
        if self.calc_stress:
            out.append(properties.stress)
        return out


@dataclasses.dataclass
class Response:
    """Spec: general response-property engine (parity: response.py:171-431).

    Supported: forces, stress, hessian, dipole_moment (dE/dF), partial
    charges (d2E/dFdR trace), dipole_derivatives, polarizability (d2E/dF2),
    shielding (d2E/dB dI).  Field-based responses require a representation
    that couples to the injected external fields (FieldSchNet).
    """

    energy_key: str = properties.energy
    response_properties: Sequence[str] = (properties.forces,)

    def __post_init__(self):
        self.response_properties = list(self.response_properties)

    @property
    def required_fields(self) -> List[str]:
        fields = []
        for p in self.response_properties:
            for f in properties.required_external_fields.get(p, []):
                if f not in fields:
                    fields.append(f)
        return fields


def is_response_module(obj) -> bool:
    return isinstance(obj, (Forces, Response))


def required_derivatives(specs: Sequence) -> Dict[str, bool]:
    """Which primals the energy closure must expose as differentiable."""
    props = set()
    for s in specs:
        props.update(s.response_properties)
    return {
        "positions": bool(
            props & {properties.forces, properties.hessian, properties.dipole_derivatives,
                     properties.partial_charges}
        ),
        "strain": properties.stress in props,
        "electric_field": bool(
            props & {properties.dipole_moment, properties.polarizability,
                     properties.dipole_derivatives, properties.partial_charges,
                     properties.polarizability_derivatives}
        ),
        "magnetic_field": bool(props & {properties.shielding}),
        "nuclear_magnetic_moments": bool(
            props & {properties.shielding, properties.nuclear_spin_coupling}
        ),
    }
