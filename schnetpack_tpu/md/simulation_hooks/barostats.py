"""Barostats for NPT simulation.

Parity targets: ``src/schnetpack/md/simulation_hooks/barostats.py``
(NHCBarostatIsotropic — MTK barostat with Nose-Hoover chains) and
``barostats_rpmd.py`` (PILEBarostat).  A barostat doubles as thermostat and
propagator: the NPT integrators delegate their half/main steps to it
(reference barostats.py:31-160).

Implementation: Martyna-Tobias-Klein isotropic scheme —
  * ``apply`` (step begin/end): NHC thermostatting of particle momenta and
    of the cell momentum;
  * ``propagate_half_step``: cell-momentum force update
    G = [3V(P_int - P_ext) + (3/N_f) 2KE]/W interleaved with the
    exp-weighted particle momentum kick;
  * ``propagate_main_step``: coupled position/cell update with the
    stable sinh(x)/x expansion.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ...ops.math import stable_sinh_div
from ...units import md_units
from ..system import System
from .thermostats import _FS, LangevinThermostat, NHCThermostat, ThermostatHook

class BarostatHook(ThermostatHook):
    """Base: target_pressure [bar], temperature_bath [K]."""

    ring_polymer = False
    needs_rng = False
    is_barostat = True

    def __init__(self, target_pressure: float, temperature_bath: float,
                 time_constant: float = 1000.0):
        super().__init__(temperature_bath, time_constant)
        from ...units import _parse_unit

        self.target_pressure = (
            target_pressure * _parse_unit("bar") * md_units().pressure
        )

    def propagate_half_step(self, system: System, dt: float) -> System:
        raise NotImplementedError

    def propagate_main_step(self, system: System, dt: float) -> System:
        raise NotImplementedError


class NHCBarostatIsotropic(BarostatHook):
    """Isotropic MTK barostat with NHC thermostatting
    (parity: barostats.py:162-706)."""

    def __init__(
        self,
        target_pressure: float,
        temperature_bath: float,
        time_constant: float = 100.0,
        time_constant_cell: float = 1000.0,
        time_constant_barostat: float = 1000.0,
        chain_length: int = 4,
        multi_step: int = 4,
        integration_order: int = 7,
    ):
        super().__init__(target_pressure, temperature_bath, time_constant)
        self.particle_nhc = NHCThermostat(
            temperature_bath, time_constant, chain_length,
            massive=False, multi_step=multi_step, integration_order=integration_order,
        )
        self.tau_b = time_constant_barostat * md_units().time * _FS
        self.tau_cell = time_constant_cell * md_units().time * _FS

    # -- propagation --------------------------------------------------------
    def _g_eps(self, state, system: System) -> jax.Array:
        dof = jnp.maximum(system.degrees_of_freedom[None, :], 1.0)
        V = jnp.maximum(system.volume, 1e-12)
        ke2 = 2.0 * system.kinetic_energy
        p_int = system.pressure
        return (3.0 * V * (p_int - self.target_pressure) + (3.0 / dof) * ke2) / state["W"]

    def propagate_half_step(self, system: System, dt: float) -> System:
        # read-only w.r.t. barostat state: all v_eps updates happen in
        # apply() so they flow through the scan carry.
        state = self._live_state
        v_eps = state["v_eps"]
        dof = jnp.maximum(system.degrees_of_freedom[None, :], 1.0)
        alpha = 1.0 + 3.0 / dof

        a = alpha * system.expand_atoms(v_eps[..., None])  # [R, A, 1]
        decay = jnp.exp(-0.5 * dt * a)
        kick_weight = jnp.exp(-0.25 * dt * a) * stable_sinh_div(0.25 * dt * a)
        p = system.momenta * decay + 0.5 * dt * system.forces * kick_weight
        return system.replace(momenta=p * system.atom_mask[None, :, None])

    def propagate_main_step(self, system: System, dt: float) -> System:
        state = self._live_state
        v_eps = state["v_eps"]
        a = system.expand_atoms(v_eps[..., None])  # [R, A, 1]
        grow = jnp.exp(dt * a)
        drift_weight = jnp.exp(0.5 * dt * a) * stable_sinh_div(0.5 * dt * a)
        q = system.positions * grow + dt * system.momenta / system.masses[None, :, None] * drift_weight
        cells = system.cells * jnp.exp(dt * v_eps)[..., None, None]
        return system.replace(positions=q, cells=cells)

    # The NPT integrator calls propagate_* outside the hook-state plumbing;
    # the simulator stores the live state dict here each time apply() runs.
    @property
    def _live_state(self):
        return self.__dict__.setdefault("_state_ref", {})

    def init_state(self, system: System, dt: float):
        state = {
            "particle_nhc": self.particle_nhc.init_state(system, dt),
            "v_eps": jnp.zeros(system.energy.shape, system.momenta.dtype),
            "W": jnp.broadcast_to(
                (system.degrees_of_freedom[None, :] + 3.0)
                * md_units().kB * self.temperature_bath * self.tau_b**2,
                system.energy.shape,
            ).astype(system.momenta.dtype),
            "xi_cell": jnp.zeros(system.energy.shape, system.momenta.dtype),
            "q_cell": jnp.full(
                system.energy.shape,
                md_units().kB * self.temperature_bath * self.tau_cell**2,
                system.momenta.dtype,
            ),
        }
        self.__dict__["_state_ref"] = dict(state)
        return state

    def apply(self, state, system, key, dt):
        kBT = md_units().kB * self.temperature_bath
        nhc_state, system = self.particle_nhc.apply(
            state["particle_nhc"], system, key, dt
        )
        v_eps, W = state["v_eps"], state["W"]
        xi, q = state["xi_cell"], state["q_cell"]
        # NH thermostat on the cell momentum
        g_cell = (W * v_eps**2 - kBT) / q
        xi = xi + 0.25 * dt * g_cell
        v_eps = v_eps * jnp.exp(-0.5 * dt * xi)
        g_cell = (W * v_eps**2 - kBT) / q
        xi = xi + 0.25 * dt * g_cell
        # MTK cell-momentum force update (half kick per application)
        v_eps = v_eps + 0.5 * dt * self._g_eps(state, system)
        new_state = {
            **state, "particle_nhc": nhc_state, "v_eps": v_eps, "xi_cell": xi,
        }
        # keep the propagate_* view in sync (traced values; same trace)
        self.__dict__["_state_ref"] = new_state
        return new_state, system


def _sym_expm_weighted(v: jax.Array, dt: float, sinh_weight: bool):
    """exp(dt v) (and the sinh(x)/x-weighted variant) for symmetric [..,3,3]
    matrices via eigendecomposition."""
    w, U = jnp.linalg.eigh(v)
    e = jnp.exp(dt * w)
    expm = jnp.einsum("...ik,...k,...jk->...ij", U, e, U)
    if not sinh_weight:
        return expm
    weight = jnp.exp(0.5 * dt * w) * stable_sinh_div(0.5 * dt * w)
    wm = jnp.einsum("...ik,...k,...jk->...ij", U, weight, U)
    return expm, wm


class NHCBarostatAnisotropic(NHCBarostatIsotropic):
    """Fully flexible-cell MTK barostat (parity: barostats.py:707-926).

    The cell momentum is a symmetric tensor v_g [R, M, 3, 3]; the particle
    and cell updates use matrix exponentials of v_g (computed by
    eigendecomposition of the 3x3 blocks — negligible cost).
    """

    def init_state(self, system: System, dt: float):
        state = super().init_state(system, dt)
        state["v_g"] = jnp.zeros(
            system.energy.shape + (3, 3), system.momenta.dtype
        )
        self.__dict__["_state_ref"] = dict(state)
        return state

    def _g_g(self, state, system: System) -> jax.Array:
        """Cell-momentum force: (V(P_int - P_ext I) + 2KE/dof I)/W."""
        dof = jnp.maximum(system.degrees_of_freedom[None, :], 1.0)
        V = jnp.maximum(system.volume, 1e-12)
        eye = jnp.eye(3, dtype=system.momenta.dtype)
        # internal pressure tensor: kinetic part + potential (−stress)
        p_int = (
            2.0 * system.kinetic_energy_tensor / V[..., None, None]
            - system.stress
        )
        ke2 = 2.0 * system.kinetic_energy
        num = (
            V[..., None, None] * (p_int - self.target_pressure * eye)
            + (ke2 / dof)[..., None, None] * eye
        )
        return num / state["W"][..., None, None]

    def apply(self, state, system, key, dt):
        kBT = md_units().kB * self.temperature_bath
        nhc_state, system = self.particle_nhc.apply(
            state["particle_nhc"], system, key, dt
        )
        v_g, W = state["v_g"], state["W"]
        xi, q = state["xi_cell"], state["q_cell"]
        # NH thermostat on the cell-momentum kinetic energy (9 dof)
        ke_cell = W[..., None, None] * v_g * v_g
        g_cell = (jnp.sum(ke_cell, axis=(-2, -1)) - 9.0 * kBT) / q
        xi = xi + 0.25 * dt * g_cell
        v_g = v_g * jnp.exp(-0.5 * dt * xi)[..., None, None]
        g_cell = (jnp.sum(W[..., None, None] * v_g * v_g, axis=(-2, -1)) - 9.0 * kBT) / q
        xi = xi + 0.25 * dt * g_cell
        # MTK force update (half kick per application), symmetrized
        v_g = v_g + 0.5 * dt * self._g_g(state, system)
        v_g = 0.5 * (v_g + jnp.swapaxes(v_g, -1, -2))
        new_state = {
            **state, "particle_nhc": nhc_state, "v_g": v_g, "xi_cell": xi,
        }
        self.__dict__["_state_ref"] = new_state
        return new_state, system

    def propagate_half_step(self, system: System, dt: float) -> System:
        state = self._live_state
        v_g = state["v_g"]
        dof = jnp.maximum(system.degrees_of_freedom[None, :], 1.0)
        eye = jnp.eye(3, dtype=system.momenta.dtype)
        trace = jnp.trace(v_g, axis1=-2, axis2=-1)
        v_eff = v_g + (trace / dof)[..., None, None] * eye  # [R, M, 3, 3]
        decay, kick_w = _sym_expm_weighted(-v_eff, 0.5 * dt, sinh_weight=True)
        decay_a = system.expand_atoms(decay)      # [R, A, 3, 3]
        kick_a = system.expand_atoms(kick_w)
        p = (
            jnp.einsum("raij,raj->rai", decay_a, system.momenta)
            + 0.5 * dt * jnp.einsum("raij,raj->rai", kick_a, system.forces)
        )
        return system.replace(momenta=p * system.atom_mask[None, :, None])

    def propagate_main_step(self, system: System, dt: float) -> System:
        state = self._live_state
        v_g = state["v_g"]
        grow, drift_w = _sym_expm_weighted(v_g, dt, sinh_weight=True)
        grow_a = system.expand_atoms(grow)
        drift_a = system.expand_atoms(drift_w)
        v = system.momenta / system.masses[None, :, None]
        q = (
            jnp.einsum("raij,raj->rai", grow_a, system.positions)
            + dt * jnp.einsum("raij,raj->rai", drift_a, v)
        )
        cells = jnp.einsum("rmij,rmkj->rmki", grow, system.cells)
        return system.replace(positions=q, cells=cells)


class PILEBarostat(BarostatHook):
    """Stochastic (Langevin) isotropic barostat for RPMD
    (parity: barostats_rpmd.py:21-208)."""

    ring_polymer = True
    needs_rng = True

    def __init__(self, target_pressure: float, temperature_bath: float,
                 time_constant: float = 1000.0):
        super().__init__(target_pressure, temperature_bath, time_constant)
        self.pile = None  # set lazily to thermostat particles

    def init_state(self, system: System, dt: float):
        kBT_P = md_units().kB * self.temperature_bath * system.n_replicas
        dof = system.degrees_of_freedom[None, :]
        W = (dof + 3.0) * kBT_P * self.time_constant**2
        state = {
            "v_eps": jnp.zeros(system.energy.shape, system.momenta.dtype),
            "W": jnp.broadcast_to(W, system.energy.shape).astype(system.momenta.dtype),
        }
        self.__dict__["_state_ref"] = dict(state)
        return state

    def apply(self, state, system, key, dt):
        # Langevin on the cell momentum
        kBT_P = md_units().kB * self.temperature_bath * system.n_replicas
        c1 = jnp.exp(-0.5 * dt / self.time_constant)
        c2 = jnp.sqrt((1.0 - c1**2) * kBT_P / state["W"])
        xi = jax.random.normal(key, state["v_eps"].shape, state["v_eps"].dtype)
        v_eps = c1 * state["v_eps"] + c2 * xi
        new_state = {**state, "v_eps": v_eps}
        self.__dict__["_state_ref"] = new_state
        return new_state, system

    def _g_eps(self, state, system: System) -> jax.Array:
        dof = jnp.maximum(system.degrees_of_freedom[None, :], 1.0)
        V = jnp.maximum(system.volume, 1e-12)
        ke2 = 2.0 * system.kinetic_energy
        return (
            3.0 * V * (system.pressure - self.target_pressure) + (3.0 / dof) * ke2
        ) / state["W"]

    propagate_half_step = NHCBarostatIsotropic.propagate_half_step
    propagate_main_step = NHCBarostatIsotropic.propagate_main_step

    @property
    def _live_state(self):
        return self.__dict__.setdefault("_state_ref", {})
