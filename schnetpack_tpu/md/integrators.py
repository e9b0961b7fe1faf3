"""MD integrators.

Parity: ``src/schnetpack/md/integrators.py`` — VelocityVerlet, RingPolymer
(exact normal-mode propagation of the free ring polymer), and NPT variants
that delegate the position/cell update to a barostat.

All integrators are pure ``System -> System`` transformers; the time step
``dt`` is given in the global MD unit frame.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..units import md_units
from .system import System
from .utils.normal_modes import (
    NormalModeTransformer,
    normal_mode_frequencies,
    normal_mode_matrix,
)


class VelocityVerlet:
    """Standard velocity Verlet (parity: integrators.py:83-110)."""

    ring_polymer = False
    pressure_control = False

    def __init__(self, time_step: float, time_unit: str = "fs"):
        from ..units import _parse_unit

        self.dt = time_step * _parse_unit(time_unit) * md_units().time

    def half_step(self, system: System) -> System:
        p = system.momenta + 0.5 * self.dt * system.forces
        return system.replace(momenta=p * system.atom_mask[None, :, None])

    def main_step(self, system: System) -> System:
        q = system.positions + self.dt * system.momenta / system.masses[None, :, None]
        return system.replace(positions=q)


class RingPolymer:
    """RPMD integrator: exact free-ring-polymer evolution in normal modes
    (parity: integrators.py:113-229)."""

    ring_polymer = True
    pressure_control = False

    def __init__(
        self,
        time_step: float,
        n_beads: int,
        temperature: float,
        time_unit: str = "fs",
    ):
        from ..units import _parse_unit

        self.dt = time_step * _parse_unit(time_unit) * md_units().time
        self.n_beads = n_beads
        self.temperature = temperature
        kB, hbar = md_units().kB, md_units().hbar
        self.omega_P = n_beads * kB * temperature / hbar
        self.transformer = NormalModeTransformer(n_beads)
        omega_k = normal_mode_frequencies(n_beads, self.omega_P)  # [P]
        dtw = omega_k * self.dt
        # 2x2 propagator per mode: [p'; q'] = [[cos, -m w sin], [sin/(m w), cos]]
        self.cos_wt = jnp.asarray(np.cos(dtw))
        self.sin_wt = jnp.asarray(np.sin(dtw))
        self.omega_k = jnp.asarray(omega_k)

    def half_step(self, system: System) -> System:
        p = system.momenta + 0.5 * self.dt * system.forces
        return system.replace(momenta=p * system.atom_mask[None, :, None])

    def main_step(self, system: System) -> System:
        m = system.masses[None, :, None]
        pn = self.transformer.beads2normal(system.momenta)
        qn = self.transformer.beads2normal(system.positions)

        c = self.cos_wt[:, None, None]
        s = self.sin_wt[:, None, None]
        w = self.omega_k[:, None, None]
        # centroid mode (w=0): free particle
        sin_over_w = jnp.where(w > 0, s / jnp.maximum(w, 1e-30), self.dt)
        pn_new = c * pn - jnp.where(w > 0, w * s, 0.0) * (m * qn)
        qn_new = c * qn + sin_over_w * pn / m

        return system.replace(
            momenta=self.transformer.normal2beads(pn_new)
            * system.atom_mask[None, :, None],
            positions=self.transformer.normal2beads(qn_new),
        )


class NPTVelocityVerlet(VelocityVerlet):
    """NPT integrator: delegates half/main steps to the barostat
    (parity: integrators.py:232-267)."""

    pressure_control = True

    def __init__(self, time_step: float, barostat, time_unit: str = "fs"):
        super().__init__(time_step, time_unit)
        self.barostat = barostat

    def half_step(self, system: System) -> System:
        return self.barostat.propagate_half_step(system, self.dt)

    def main_step(self, system: System) -> System:
        return self.barostat.propagate_main_step(system, self.dt)


class NPTRingPolymer(RingPolymer):
    """NPT ring-polymer integrator (parity: integrators.py:270-305)."""

    pressure_control = True

    def __init__(self, time_step, n_beads, temperature, barostat, time_unit="fs"):
        super().__init__(time_step, n_beads, temperature, time_unit)
        self.barostat = barostat

    def half_step(self, system: System) -> System:
        return self.barostat.propagate_half_step(system, self.dt)

    def main_step(self, system: System) -> System:
        return self.barostat.propagate_main_step(system, self.dt)
