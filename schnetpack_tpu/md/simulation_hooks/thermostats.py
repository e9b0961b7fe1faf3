"""Classical thermostats.

Parity: ``src/schnetpack/md/simulation_hooks/thermostats.py`` — Berendsen,
Langevin (exact OU update), Nose-Hoover chains (Yoshida-Suzuki multi-step,
massive option) and GLE (i-PI matrix files).

Design: every thermostat is a pure state transformer
``apply(state, system, key, dt) -> (state, system)`` applied by the
simulator at ``on_step_begin`` and ``on_step_end`` with half the MD time
step, so the full step loop jits into one ``lax.scan`` body.  PRNG keys are
threaded by the simulator.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...units import md_units
from ..system import System
from ..utils.thermostat_utils import load_gle_matrices, ys_weights


from ...units import _parse_unit as _pu

_FS = _pu("fs")


class ThermostatHook:
    """Base: temperature_bath [K], time_constant [fs]."""

    ring_polymer = False
    needs_rng = False

    def __init__(self, temperature_bath: float, time_constant: float = 100.0):
        self.temperature_bath = temperature_bath
        self.time_constant = time_constant * md_units().time * _FS

    def init_state(self, system: System, dt: float) -> Any:
        return None

    def apply(self, state, system: System, key, dt: float) -> Tuple[Any, System]:
        raise NotImplementedError


class BerendsenThermostat(ThermostatHook):
    """Velocity rescaling toward the bath temperature
    (parity: thermostats.py:149-190)."""

    def apply(self, state, system, key, dt):
        T = system.temperature  # [R, M]
        # applied twice per MD step -> half coupling per application
        scale = jnp.sqrt(
            1.0 + 0.5 * dt / self.time_constant * (self.temperature_bath / jnp.maximum(T, 1e-9) - 1.0)
        )
        p = system.momenta * system.expand_atoms(scale[..., None])
        return state, system.replace(momenta=p * system.atom_mask[None, :, None])


class LangevinThermostat(ThermostatHook):
    """Exact Ornstein-Uhlenbeck update: p' = c1 p + sqrt(m kB T) c2 xi
    (parity: thermostats.py:192-263)."""

    needs_rng = True

    def apply(self, state, system, key, dt):
        kBT = md_units().kB * self.temperature_bath
        # half-kick per application (applied at step begin and end);
        # parity: reference thermostats.py:233 c1 = exp(-0.5 dt gamma)
        c1 = jnp.exp(-0.5 * dt / self.time_constant)
        c2 = jnp.sqrt(1.0 - c1**2)
        xi = jax.random.normal(key, system.momenta.shape, system.momenta.dtype)
        sigma = jnp.sqrt(system.masses * kBT)[None, :, None]
        p = c1 * system.momenta + c2 * sigma * xi
        return state, system.replace(momenta=p * system.atom_mask[None, :, None])


class NHCThermostat(ThermostatHook):
    """Nose-Hoover chains with Yoshida-Suzuki multi-timestep integration
    (parity: thermostats.py:264-526).

    ``massive=False``: one chain per molecule (couples to its total kinetic
    energy).  ``massive=True``: one chain per degree of freedom.
    """

    def __init__(
        self,
        temperature_bath: float,
        time_constant: float = 100.0,
        chain_length: int = 3,
        massive: bool = False,
        multi_step: int = 2,
        integration_order: int = 3,
    ):
        super().__init__(temperature_bath, time_constant)
        self.chain_length = chain_length
        self.massive = massive
        self.multi_step = multi_step
        self.ys = ys_weights(integration_order)

    def _kbt(self, system: System) -> float:
        """Bath thermal energy; ring-polymer subclasses scale by n_beads
        (avoids the fragile pattern of mutating temperature_bath around a
        parent call, which breaks under concurrent retracing)."""
        return md_units().kB * self.temperature_bath

    def _dof_and_ke(self, system: System):
        if self.massive:
            # per-DOF: KE contribution p^2/m, dof = 1
            ke2 = system.momenta**2 / system.masses[None, :, None]  # [R, A, 3] = 2*KE
            dof = jnp.ones_like(ke2)
            return dof, ke2
        ke2 = 2.0 * system.kinetic_energy  # [R, M]
        dof = jnp.broadcast_to(
            system.degrees_of_freedom[None, :], ke2.shape
        )
        return dof, ke2

    def init_state(self, system: System, dt: float):
        kBT = self._kbt(system)
        if self.massive:
            shape = system.momenta.shape  # [R, A, 3]
        else:
            shape = system.energy.shape  # [R, M]
        dof, _ = self._dof_and_ke(system)
        # thermostat masses: Q_0 = dof kBT tau^2, Q_k = kBT tau^2
        q = jnp.broadcast_to(
            kBT * self.time_constant**2 * jnp.ones(shape + (self.chain_length,)),
            shape + (self.chain_length,),
        ).copy()
        q = q.at[..., 0].mul(dof)
        return {
            "p_xi": jnp.zeros(shape + (self.chain_length,), system.momenta.dtype),
            "q": q.astype(system.momenta.dtype),
        }

    def apply(self, state, system, key, dt):
        kBT = self._kbt(system)
        p_xi = state["p_xi"]
        q = state["q"]
        dof, ke2 = self._dof_and_ke(system)

        scale = jnp.ones_like(ke2)
        n = self.chain_length
        for _ in range(self.multi_step):
            for w in self.ys:
                delta = w * dt / self.multi_step
                # update chain from the tail inward
                if n > 1:
                    g_last = (p_xi[..., n - 2] ** 2 / q[..., n - 2] - kBT)
                else:
                    g_last = ke2 * scale**2 - dof * kBT
                p_xi = p_xi.at[..., n - 1].add(0.25 * delta * g_last)
                for k in range(n - 2, -1, -1):
                    coeff = jnp.exp(-0.125 * delta * p_xi[..., k + 1] / q[..., k + 1])
                    if k == 0:
                        g_k = ke2 * scale**2 - dof * kBT
                    else:
                        g_k = p_xi[..., k - 1] ** 2 / q[..., k - 1] - kBT
                    p_xi = p_xi.at[..., k].set(
                        coeff * (coeff * p_xi[..., k] + 0.25 * delta * g_k)
                    )
                # scale the system momenta
                scale = scale * jnp.exp(-0.5 * delta * p_xi[..., 0] / q[..., 0])
                # update chain outward
                for k in range(0, n - 1):
                    coeff = jnp.exp(-0.125 * delta * p_xi[..., k + 1] / q[..., k + 1])
                    if k == 0:
                        g_k = ke2 * scale**2 - dof * kBT
                    else:
                        g_k = p_xi[..., k - 1] ** 2 / q[..., k - 1] - kBT
                    p_xi = p_xi.at[..., k].set(
                        coeff * (coeff * p_xi[..., k] + 0.25 * delta * g_k)
                    )
                if n > 1:
                    g_last = p_xi[..., n - 2] ** 2 / q[..., n - 2] - kBT
                else:
                    g_last = ke2 * scale**2 - dof * kBT
                p_xi = p_xi.at[..., n - 1].add(0.25 * delta * g_last)

        if self.massive:
            p = system.momenta * scale
        else:
            p = system.momenta * system.expand_atoms(scale[..., None])
        system = system.replace(momenta=p * system.atom_mask[None, :, None])
        return {"p_xi": p_xi, "q": q}, system


class GLEThermostat(ThermostatHook):
    """Colored-noise generalized Langevin thermostat from i-PI matrix files
    (parity: thermostats.py:527-729).

    State: auxiliary momenta s [R, A, 3, n_aux]; update
    (p, s) -> T (p, s) + S xi with T = expm(-dt A), S S^T = C - T C T^T.
    """

    needs_rng = True

    def __init__(self, temperature_bath: float, gle_file: str, free_particle_limit: bool = True):
        super().__init__(temperature_bath, time_constant=1.0)
        self.gle_file = gle_file
        self.free_particle_limit = free_particle_limit
        a, c = load_gle_matrices(gle_file)
        if a is None:
            raise ValueError(f"Could not parse A matrix from {gle_file}")
        if a.shape[0] > 1:
            raise ValueError(
                "More than one A matrix found — this looks like a PIGLET "
                "input; use PIGLETThermostat"
            )
        self._a = a[0]
        self._c = c[0] if c is not None else None

    @staticmethod
    def _single_propagator(a: np.ndarray, c: np.ndarray, dt_half: float):
        """(T, S) with T = expm(-dt/2 A) and S S^T = C - T C T^T."""
        import scipy.linalg as sla

        T = sla.expm(-dt_half * a)
        S2 = c - T @ c @ T.T
        # symmetrize + PSD projection for numerical safety
        S2 = 0.5 * (S2 + S2.T)
        w, v = np.linalg.eigh(S2)
        S = v @ np.diag(np.sqrt(np.maximum(w, 0.0))) @ v.T
        return T, S

    def _propagators(self, dt: float):
        n = self._a.shape[-1]
        if self._c is None:
            c = md_units().kB * self.temperature_bath * np.eye(n)
        else:
            c = self._c
        # half-kick per application
        return self._single_propagator(self._a, c, 0.5 * dt)

    def init_state(self, system: System, dt: float):
        n_aux = self._a.shape[-1] - 1
        T, S = self._propagators(dt)
        return {
            "s": jnp.zeros(system.momenta.shape + (n_aux,), system.momenta.dtype),
            "T": jnp.asarray(T, system.momenta.dtype),
            "S": jnp.asarray(S, system.momenta.dtype),
        }

    def apply(self, state, system, key, dt):
        T, S = state["T"], state["S"]
        # combined vector [p/sqrt(m), s]
        sqrt_m = jnp.sqrt(system.masses)[None, :, None]
        p_norm = system.momenta / sqrt_m
        vec = jnp.concatenate([p_norm[..., None], state["s"]], axis=-1)  # [R,A,3,n]
        xi = jax.random.normal(key, vec.shape, vec.dtype)
        new = jnp.einsum("ij,rakj->raki", T, vec) + jnp.einsum("ij,rakj->raki", S, xi)
        p = new[..., 0] * sqrt_m * system.atom_mask[None, :, None]
        return {**state, "s": new[..., 1:]}, system.replace(momenta=p)
