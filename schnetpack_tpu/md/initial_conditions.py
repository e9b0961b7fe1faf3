"""Initial momenta sampling.

Parity: ``src/schnetpack/md/initial_conditions.py`` — MaxwellBoltzmannInit /
UniformInit with optional removal of center-of-mass translation and
rotation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..units import md_units
from .system import System


class Initializer:
    def __init__(
        self,
        temperature: float,
        remove_center_of_mass: bool = True,
        remove_translation: bool = True,
        remove_rotation: bool = False,
        wrap_positions: bool = False,
    ):
        self.temperature = temperature
        self.remove_center_of_mass = remove_center_of_mass
        self.remove_translation = remove_translation
        self.remove_rotation = remove_rotation
        self.wrap_positions = wrap_positions

    def _sample(self, system: System, key) -> jax.Array:
        raise NotImplementedError

    def initialize_system(self, system: System, key) -> System:
        p = self._sample(system, key)
        system = system.replace(momenta=p * system.atom_mask[None, :, None])
        if self.remove_translation:
            system = system.remove_com_motion()
        if self.remove_rotation:
            system = self._remove_rotation(system)
        if self.remove_center_of_mass:
            com = system.center_of_mass()
            system = system.replace(
                positions=system.positions - system.expand_atoms(com)
            )
        if self.wrap_positions:
            system = system.wrap_positions()
        # rescale so the instantaneous temperature matches the target exactly
        T = system.temperature  # [R, M]
        scale = jnp.sqrt(self.temperature / jnp.maximum(T, 1e-12))
        system = system.replace(
            momenta=system.momenta * system.expand_atoms(scale[..., None])
        )
        return system

    def _remove_rotation(self, system: System) -> System:
        """Zero the angular momentum of every molecule (parity:
        initial_conditions.py:50-87)."""
        com = system.expand_atoms(system.center_of_mass())
        r = system.positions - com  # [R, A, 3]
        m = system.masses[None, :, None]
        L = system.sum_atoms(jnp.cross(r, system.momenta))  # [R, M, 3]
        # inertia tensor per molecule
        r2 = jnp.sum(r * r, axis=-1, keepdims=True)[..., None]  # [R, A, 1, 1]
        eye = jnp.eye(3, dtype=r.dtype)
        I_atom = m[..., None] * (r2 * eye - r[..., :, None] * r[..., None, :])
        I_mol = system.sum_atoms(I_atom)  # [R, M, 3, 3]
        I_mol = I_mol + eye * 1e-9
        omega = jnp.linalg.solve(I_mol, L[..., None])[..., 0]  # [R, M, 3]
        v_rot = jnp.cross(system.expand_atoms(omega), r)
        p = (system.momenta - v_rot * m) * system.atom_mask[None, :, None]
        return system.replace(momenta=p)


class MaxwellBoltzmannInit(Initializer):
    def _sample(self, system: System, key) -> jax.Array:
        kB = md_units().kB
        sigma = jnp.sqrt(system.masses * kB * self.temperature)[None, :, None]
        return sigma * jax.random.normal(
            key, system.momenta.shape, dtype=system.momenta.dtype
        )


class UniformInit(Initializer):
    def _sample(self, system: System, key) -> jax.Array:
        kB = md_units().kB
        sigma = jnp.sqrt(system.masses * kB * self.temperature)[None, :, None]
        u = jax.random.uniform(
            key, system.momenta.shape, dtype=system.momenta.dtype, minval=-1.0, maxval=1.0
        )
        return sigma * u * jnp.sqrt(3.0)
