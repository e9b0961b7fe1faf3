"""Ring-polymer (RPMD) thermostats.

Parity: ``src/schnetpack/md/simulation_hooks/thermostats_rpmd.py`` — PILE
local/global (normal-mode-resolved Langevin, Ceriotti 2010), TRPMD, and the
NHC ring-polymer variant.  Bead temperature convention matches the
reference: kB T multiplied by n_replicas (thermostats_rpmd.py:99,176,428).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...units import md_units
from ..system import System
from ..utils.normal_modes import NormalModeTransformer, normal_mode_frequencies
from .thermostats import NHCThermostat, ThermostatHook


class PILELocalThermostat(ThermostatHook):
    """Path-integral Langevin (local): centroid damped with 1/tau, internal
    modes with gamma_k = 2 omega_k (parity: thermostats_rpmd.py:33-126)."""

    ring_polymer = True
    needs_rng = True

    def __init__(self, temperature_bath: float, time_constant: float = 100.0,
                 thermostat_centroid: bool = True, damping_factor: float = 1.0):
        super().__init__(temperature_bath, time_constant)
        self.thermostat_centroid = thermostat_centroid
        self.damping_factor = damping_factor

    def _coeffs(self, system: System, dt: float):
        P = system.n_replicas
        kB, hbar = md_units().kB, md_units().hbar
        omega_P = P * kB * self.temperature_bath / hbar
        omega_k = normal_mode_frequencies(P, omega_P)  # [P]
        gamma = 2.0 * omega_k * self.damping_factor
        gamma[0] = (1.0 / self.time_constant) if self.thermostat_centroid else 0.0
        # half-kick per application (reference thermostats_rpmd.py:233-ish)
        c1 = np.exp(-0.5 * dt * gamma)
        c2 = np.sqrt(1.0 - c1**2)
        return jnp.asarray(c1), jnp.asarray(c2)

    def init_state(self, system: System, dt: float):
        c1, c2 = self._coeffs(system, dt)
        return {
            "c1": c1.astype(system.momenta.dtype),
            "c2": c2.astype(system.momenta.dtype),
        }

    def apply(self, state, system, key, dt):
        P = system.n_replicas
        kBT_P = md_units().kB * self.temperature_bath * P
        nm = NormalModeTransformer(P)
        pn = nm.beads2normal(system.momenta)
        xi = jax.random.normal(key, pn.shape, pn.dtype)
        sigma = jnp.sqrt(system.masses * kBT_P)[None, :, None]
        pn = state["c1"][:, None, None] * pn + state["c2"][:, None, None] * sigma * xi
        p = nm.normal2beads(pn) * system.atom_mask[None, :, None]
        return state, system.replace(momenta=p)


class TRPMDThermostat(PILELocalThermostat):
    """Thermostatted RPMD: internal modes only, gamma_k = lambda omega_k
    (parity: thermostats_rpmd.py:211-236)."""

    def __init__(self, temperature_bath: float, damping_factor: float = 0.5):
        super().__init__(
            temperature_bath, time_constant=1e30,
            thermostat_centroid=False, damping_factor=damping_factor,
        )


class PILEGlobalThermostat(PILELocalThermostat):
    """PILE with stochastic-velocity-rescaling of the centroid mode
    (parity: thermostats_rpmd.py:129-210)."""

    def apply(self, state, system, key, dt):
        P = system.n_replicas
        kBT_P = md_units().kB * self.temperature_bath * P
        nm = NormalModeTransformer(P)
        pn = nm.beads2normal(system.momenta)

        key_local, key_g, key_chi = jax.random.split(key, 3)
        # internal modes: local Langevin
        xi = jax.random.normal(key_local, pn.shape, pn.dtype)
        sigma = jnp.sqrt(system.masses * kBT_P)[None, :, None]
        internal = state["c1"][:, None, None] * pn + state["c2"][:, None, None] * sigma * xi
        internal = internal.at[0].set(pn[0])

        # centroid: stochastic velocity rescaling (Bussi-Donadio-Parrinello)
        c1_0 = jnp.exp(-0.5 * dt / self.time_constant)
        p0 = pn[0]  # [A, 3]
        ke0 = system.sum_atoms(
            (0.5 * jnp.sum(p0**2, axis=-1) / system.masses)[None, :, None]
        )[0, :, 0]  # [M]
        dof = jnp.maximum(system.degrees_of_freedom, 1.0)
        # target per-molecule kinetic energy at bead temperature
        ke_target = 0.5 * dof * kBT_P
        r1 = jax.random.normal(key_g, ke0.shape, p0.dtype)
        r2 = jax.random.chisquare(key_chi, dof - 1.0, shape=ke0.shape).astype(p0.dtype)
        ratio = ke_target / jnp.maximum(ke0, 1e-12) / dof
        alpha2 = (
            c1_0
            + (1.0 - c1_0) * ratio * (r2 + r1**2)
            + 2.0 * r1 * jnp.sqrt(c1_0 * (1.0 - c1_0) * ratio)
        )
        alpha = jnp.sqrt(jnp.maximum(alpha2, 1e-12))  # [M]
        scale = jnp.take(alpha, system.idx_m, axis=0)[None, :, None]
        centroid = p0[None] * scale

        pn = internal.at[0].set(centroid[0])
        p = nm.normal2beads(pn) * system.atom_mask[None, :, None]
        return state, system.replace(momenta=p)


class NHCRingPolymerThermostat(NHCThermostat):
    """Massive NHC in ring-polymer normal-mode space
    (parity: thermostats_rpmd.py:373-501)."""

    ring_polymer = True

    def __init__(self, temperature_bath: float, time_constant: float = 100.0,
                 chain_length: int = 3, local: bool = True,
                 multi_step: int = 2, integration_order: int = 3):
        super().__init__(
            temperature_bath, time_constant, chain_length,
            massive=True, multi_step=multi_step, integration_order=integration_order,
        )
        self.local = local

    def _kbt(self, system: System) -> float:
        return md_units().kB * self.temperature_bath * system.n_replicas

    def apply(self, state, system, key, dt):
        # transform momenta to normal modes, run massive NHC there, back
        nm = NormalModeTransformer(system.n_replicas)
        pn = nm.beads2normal(system.momenta)
        tmp = system.replace(momenta=pn)

        # NHC with bead-scaled temperature: shift kBT by running parent with
        # adjusted bath temperature
        saved_T = self.temperature_bath
        self.temperature_bath = saved_T * system.n_replicas
        try:
            state, tmp = super().apply(state, tmp, key, dt)
        finally:
            self.temperature_bath = saved_T
        p = nm.normal2beads(tmp.momenta) * system.atom_mask[None, :, None]
        return state, system.replace(momenta=p)

    def init_state(self, system: System, dt: float):
        saved_T = self.temperature_bath
        self.temperature_bath = saved_T * system.n_replicas
        try:
            return super().init_state(system, dt)
        finally:
            self.temperature_bath = saved_T


class RPMDGLEThermostat(ThermostatHook):
    """GLE thermostat applied per bead with bead-scaled temperature
    (parity: thermostats_rpmd.py:237-336)."""

    ring_polymer = True
    needs_rng = True

    def __init__(self, temperature_bath: float, gle_file: str):
        super().__init__(temperature_bath, time_constant=1.0)
        from .thermostats import GLEThermostat

        self.gle_file = gle_file
        self._inner = GLEThermostat(temperature_bath, gle_file)

    def init_state(self, system: System, dt: float):
        self._inner.temperature_bath = self.temperature_bath * system.n_replicas
        return self._inner.init_state(system, dt)

    def apply(self, state, system, key, dt):
        return self._inner.apply(state, system, key, dt)


#: PIGLET = RPMD GLE with per-normal-mode matrices; served by the same
#: implementation when given a PIGLET matrix file.
PIGLETThermostat = RPMDGLEThermostat
