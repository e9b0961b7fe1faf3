"""Basic device-side simulation hooks.

Parity: ``src/schnetpack/md/simulation_hooks/basic_hooks.py`` —
RemoveCOMMotion and WrapPositions, expressed as pure state transformers
with a static ``every_n_steps`` gate evaluated with ``lax.cond`` so they
compile into the scan body.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..system import System


class DeviceHook:
    """Pure hook: apply(state, system, key, dt) -> (state, system)."""

    def init_state(self, system: System, dt: float):
        return jnp.zeros((), jnp.int32)  # call counter

    def apply(self, state, system, key, dt):
        raise NotImplementedError


class RemoveCOMMotion(DeviceHook):
    def __init__(self, every_n_steps: int = 100, remove_rotation: bool = False):
        # hooks run twice per step (begin+end): halve the interval in calls
        self.every_n_calls = max(2 * every_n_steps, 1)
        self.remove_rotation = remove_rotation

    def apply(self, state, system, key, dt):
        def do(sys):
            return sys.remove_com_motion()

        system = jax.lax.cond(
            state % self.every_n_calls == 0, do, lambda s: s, system
        )
        return state + 1, system


class WrapPositions(DeviceHook):
    def __init__(self, every_n_steps: int = 1):
        self.every_n_calls = max(2 * every_n_steps, 1)

    def apply(self, state, system, key, dt):
        system = jax.lax.cond(
            state % self.every_n_calls == 0,
            lambda s: s.wrap_positions(),
            lambda s: s,
            system,
        )
        return state + 1, system


class SimulationHook:
    """Host-side hook interface (parity: basic_hooks.py:14-38)."""

    def on_simulation_start(self, simulator):
        pass

    def process_chunk(self, simulator, logs, start_step: int):
        pass

    def on_simulation_end(self, simulator):
        pass
