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
    """Massive NHC in ring-polymer normal-mode space with NM-frequency
    thermostat masses (parity: thermostats_rpmd.py:373-501).

    ``local=True``: an independent chain per degree of freedom of every
    normal mode.  ``local=False``: the centroid mode is thermostatted
    globally — its first chain link gets mass and degrees of freedom scaled
    by 3N and couples to the full per-molecule centroid kinetic energy
    (reference ``_init_masses``/``_compute_kinetic_energy``).
    """

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

    def _dof_and_ke(self, system: System):
        # system.momenta hold NORMAL-MODE momenta here (see apply)
        ke2 = system.momenta**2 / system.masses[None, :, None]  # [P, A, 3]
        dof = jnp.ones_like(ke2)
        if not self.local:
            # global centroid chain: couple mode 0 to the whole molecular
            # centroid kinetic energy; dof_0 = 3N per molecule
            ke2_c = system.sum_atoms(jnp.sum(ke2[0:1], axis=2, keepdims=True))
            ke2 = ke2.at[0].set(system.expand_atoms(ke2_c)[0])
            dof3n = system.expand_atoms(
                (3.0 * system.n_atoms_per_mol.astype(ke2.dtype))[None, :, None]
            )[0]
            dof = dof.at[0].set(jnp.broadcast_to(dof3n, dof[0].shape))
        return dof, ke2

    def init_state(self, system: System, dt: float):
        P = system.n_replicas
        kBT = self._kbt(system)
        kB, hbar = md_units().kB, md_units().hbar
        omega_P = P * kB * self.temperature_bath / hbar
        freqs = normal_mode_frequencies(P, omega_P)
        # centroid frequency from the thermostat time constant
        # (0.5/tau, reference thermostats_rpmd.py:432-434)
        freqs[0] = 0.5 / self.time_constant
        q_mode = kBT / freqs**2  # [P]
        shape = system.momenta.shape  # [P, A, 3]
        q = jnp.broadcast_to(
            jnp.asarray(q_mode, system.momenta.dtype)[:, None, None, None],
            shape + (self.chain_length,),
        )
        if not self.local:
            dof3n = system.expand_atoms(
                (3.0 * system.n_atoms_per_mol.astype(q.dtype))[None, :, None]
            )[0]
            q = q.at[0, :, :, 0].mul(dof3n)
        return {
            "p_xi": jnp.zeros(shape + (self.chain_length,), system.momenta.dtype),
            "q": q.astype(system.momenta.dtype),
        }

    def apply(self, state, system, key, dt):
        # transform momenta to normal modes, run the massive NHC there, back
        nm = NormalModeTransformer(system.n_replicas)
        pn = nm.beads2normal(system.momenta)
        state, tmp = super().apply(state, system.replace(momenta=pn), key, dt)
        p = nm.normal2beads(tmp.momenta) * system.atom_mask[None, :, None]
        return state, system.replace(momenta=p)


class RPMDGLEThermostat(ThermostatHook):
    """GLE thermostat applied to ring-polymer normal-mode momenta with
    bead-scaled temperature (parity: thermostats_rpmd.py:237-298)."""

    ring_polymer = True
    needs_rng = True

    def __init__(self, temperature_bath: float, gle_file: str,
                 free_particle_limit: bool = True):
        super().__init__(temperature_bath, time_constant=1.0)
        from ..utils.thermostat_utils import load_gle_matrices

        self.gle_file = gle_file
        self.free_particle_limit = free_particle_limit
        self._a, self._c = load_gle_matrices(gle_file)
        if self._a is None:
            raise ValueError(f"Could not parse A matrix from {gle_file}")

    def _mode_propagators(self, system: System, dt: float):
        """Per-normal-mode (c1, c2) stacks [P, s, s]."""
        from .thermostats import GLEThermostat

        P = system.n_replicas
        if self._a.shape[0] != 1:
            raise ValueError(
                "RPMDGLEThermostat expects a single A matrix; per-normal-mode "
                "files are handled by PIGLETThermostat"
            )
        n = self._a.shape[-1]
        kBT_P = md_units().kB * self.temperature_bath * P
        c = self._c[0] if self._c is not None else kBT_P * np.eye(n)
        T, S = GLEThermostat._single_propagator(self._a[0], c, 0.5 * dt)
        return (np.broadcast_to(T, (P,) + T.shape).copy(),
                np.broadcast_to(S, (P,) + S.shape).copy())

    def init_state(self, system: System, dt: float):
        T, S = self._mode_propagators(system, dt)
        n_aux = self._a.shape[-1] - 1
        dtype = system.momenta.dtype
        return {
            "s": jnp.zeros(system.momenta.shape + (n_aux,), dtype),
            "T": jnp.asarray(T, dtype),   # [P, s, s]
            "S": jnp.asarray(S, dtype),
        }

    def apply(self, state, system, key, dt):
        nm = NormalModeTransformer(system.n_replicas)
        pn = nm.beads2normal(system.momenta)  # [P, A, 3]
        sqrt_m = jnp.sqrt(system.masses)[None, :, None]
        vec = jnp.concatenate([(pn / sqrt_m)[..., None], state["s"]], axis=-1)
        xi = jax.random.normal(key, vec.shape, vec.dtype)
        new = (jnp.einsum("pij,pakj->paki", state["T"], vec)
               + jnp.einsum("pij,pakj->paki", state["S"], xi))
        pn = new[..., 0] * sqrt_m
        p = nm.normal2beads(pn) * system.atom_mask[None, :, None]
        return {**state, "s": new[..., 1:]}, system.replace(momenta=p)


class PIGLETThermostat(RPMDGLEThermostat):
    """PIGLET: a DISTINCT GLE drift/diffusion pair per ring-polymer normal
    mode, parsed from the multi-section matrix files produced by gle4md
    (parity: thermostats_rpmd.py:299-372; Uhl, Marx, Ceriotti 2016)."""

    def _mode_propagators(self, system: System, dt: float):
        from .thermostats import GLEThermostat

        P = system.n_replicas
        if self._a.shape[0] != P:
            raise ValueError(
                f"PIGLET file provides {self._a.shape[0]} normal-mode "
                f"matrices but the ring polymer has {P} beads"
            )
        n = self._a.shape[-1]
        kBT_P = md_units().kB * self.temperature_bath * P
        Ts, Ss = [], []
        for b in range(P):
            c_b = self._c[b] if self._c is not None else kBT_P * np.eye(n)
            T, S = GLEThermostat._single_propagator(self._a[b], c_b, 0.5 * dt)
            Ts.append(T)
            Ss.append(S)
        return np.stack(Ts), np.stack(Ss)
