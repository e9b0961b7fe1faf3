"""MD simulator: the whole step loop as one jitted ``lax.scan``.

Parity of semantics with ``src/schnetpack/md/simulator.py:116-161``:

  calculate -> [on_step_begin] -> half_step -> main_step -> calculate
  -> [on_step_middle] -> half_step -> [on_step_end, reversed] -> log

with hook reversal for propagator symmetry (simulator.py:147-150).

TPU design: hooks are pure state transformers compiled into the scan body;
the host only sees stacked per-chunk logs (positions/energies/...), which
the host-side hooks (HDF5 FileLogger, Checkpoint, TensorBoard) consume
between chunks.  The simulation state (System + thermostat/barostat states
+ PRNG key) never leaves the device during a chunk.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .system import System


class SimulatorState(flax.struct.PyTreeNode):
    system: System
    hook_states: Tuple
    key: jax.Array
    step: jax.Array
    calc_state: Any = None


def _is_device_hook(h) -> bool:
    return hasattr(h, "apply") and callable(getattr(h, "apply"))


class Simulator:
    def __init__(
        self,
        system: System,
        integrator,
        calculator,
        simulator_hooks: Sequence = (),
        seed: int = 42,
        log_keys: Sequence[str] = (
            "positions", "momenta", "forces", "energy", "cells", "stress",
            "temperature", "kinetic_energy",
        ),
        progress: bool = True,
        profile_dir: Optional[str] = None,
    ):
        self.system = system
        self.integrator = integrator
        self.calculator = calculator
        self.device_hooks = [h for h in simulator_hooks if _is_device_hook(h)]
        self.host_hooks = [h for h in simulator_hooks if not _is_device_hook(h)]
        self.key = jax.random.PRNGKey(seed)
        self.log_keys = tuple(log_keys)
        self.progress = progress
        self.profile_dir = profile_dir
        self._profiled = False
        self.n_simulated = 0
        self._step_fn = None
        self._probe_nargs: Optional[int] = None
        self._state: Optional[SimulatorState] = None

    # ------------------------------------------------------------------
    @property
    def state(self) -> SimulatorState:
        if self._state is None:
            calc_state = (
                self.calculator.init_state(self.system)
                if hasattr(self.calculator, "init_state") else None
            )
            system = self.calculator.calculate(self.system, calc_state)
            hook_states = tuple(
                h.init_state(system, self.integrator.dt) for h in self.device_hooks
            )
            self._state = SimulatorState(
                system=system,
                hook_states=hook_states,
                key=self.key,
                step=jnp.zeros((), jnp.int32),
                calc_state=calc_state,
            )
        return self._state

    def _log_record(self, system: System) -> Dict[str, jax.Array]:
        rec = {}
        for k in self.log_keys:
            v = system.properties.get(k) if k in system.properties else (
                getattr(system, k, None))
            if v is None and k in ("temperature", "kinetic_energy"):
                v = getattr(System, k).fget(system)
            if v is not None:
                rec[k] = v
        return rec

    def _build_step(self):
        dt = self.integrator.dt
        hooks = self.device_hooks
        n_hooks = len(hooks)

        def step_fn(state: SimulatorState, _):
            key, *hook_keys = jax.random.split(state.key, 2 * n_hooks + 1)
            system = state.system
            hook_states = list(state.hook_states)

            # on_step_begin (thermostats etc.)
            for i, h in enumerate(hooks):
                hook_states[i], system = h.apply(hook_states[i], system, hook_keys[i], dt)

            system = self.integrator.half_step(system)
            system = self.integrator.main_step(system)
            # per-step neighbor-state refresh (e.g. skin-criterion NBL
            # rebuild) runs on device inside the scan; the updated state
            # is carried forward so no step ever evaluates stale edges
            calc_state = state.calc_state
            if hasattr(self.calculator, "device_step_update"):
                calc_state = self.calculator.device_step_update(
                    system, calc_state)
            system = self.calculator.calculate(system, calc_state)
            system = self.integrator.half_step(system)

            # on_step_end in reverse order (propagator symmetry)
            for i in range(n_hooks - 1, -1, -1):
                hook_states[i], system = hooks[i].apply(
                    hook_states[i], system, hook_keys[n_hooks + i], dt
                )

            new_state = SimulatorState(
                system=system,
                hook_states=tuple(hook_states),
                key=key,
                step=state.step + 1,
                calc_state=calc_state,
            )
            return new_state, self._log_record(system)

        return step_fn

    # ------------------------------------------------------------------
    def simulate(self, n_steps: int, chunk_size: int = 100) -> System:
        if self._step_fn is None:
            self._step_fn = self._build_step()
            self._scan = jax.jit(
                lambda st, n: jax.lax.scan(self._step_fn, st, None, length=n),
                static_argnums=1,
            )

        state = self.state
        for h in self.host_hooks:
            h.on_simulation_start(self)

        remaining = n_steps
        t0 = time.time()
        while remaining > 0:
            n = min(chunk_size, remaining)
            profiling = self.profile_dir and not self._profiled and self.n_simulated > 0
            if profiling:
                jax.profiler.start_trace(self.profile_dir)
            state, logs = self._scan(state, n)
            # one host round trip per chunk: the logs and the calculator's
            # rebuild probe (e.g. the NBL's max displacement) come back in a
            # single device_get — positions are only fetched when a rebuild
            # actually triggers
            probe = None
            if (hasattr(self.calculator, "chunk_probe")
                    and state.calc_state is not None):
                if self._probe_nargs is None:
                    import inspect

                    sig = inspect.signature(self.calculator.chunk_probe)
                    self._probe_nargs = min(len(sig.parameters), 2)
                if self._probe_nargs >= 2:
                    probe = self.calculator.chunk_probe(
                        state.system, state.calc_state)
                else:
                    probe = self.calculator.chunk_probe(state.system)
            logs_np, probe_np = jax.device_get((logs, probe))
            if profiling:
                jax.profiler.stop_trace()
                self._profiled = True
            # publish live state so host hooks (checkpointing) see it
            self._state = state
            start = self.n_simulated
            self.n_simulated += n
            remaining -= n
            for h in self.host_hooks:
                h.process_chunk(self, logs_np, start)
            # host-side calculator refresh (e.g. skin-based NBL rebuild)
            if hasattr(self.calculator, "update_state") and state.calc_state is not None:
                new_cs = self.calculator.update_state(
                    state.system, state.calc_state, probe=probe_np)
                if new_cs is not state.calc_state:
                    state = state.replace(calc_state=new_cs)
                    self._state = state
            if self.progress:
                rate = self.n_simulated / max(time.time() - t0, 1e-9)
                T = float(np.mean(logs_np.get("temperature", np.zeros(1))[-1]))
                print(
                    f"step {self.n_simulated}/{n_steps}  T={T:8.2f} K  "
                    f"{rate:8.1f} steps/s", flush=True,
                )

        self._state = state
        self.system = state.system
        for h in self.host_hooks:
            h.on_simulation_end(self)
        return state.system

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        state = self.state
        return {
            "state": jax.tree.map(np.asarray, state),
            "n_simulated": self.n_simulated,
        }

    def load_state_dict(self, d: Dict[str, Any], soft: bool = False):
        """Restore simulation state (parity: restart_simulation / hard vs
        soft thermostat restore, simulator.py:163-253)."""
        restored = d["state"]
        if soft and self._state is not None:
            restored = restored.replace(hook_states=self._state.hook_states)
        self._state = jax.tree.map(jnp.asarray, restored)
        self.n_simulated = d.get("n_simulated", 0)
        self.system = self._state.system
        # Rehydrate the calculator's host-side derived state (neighbor-list
        # layout, bucket capacities, on-device-rebuild eligibility).  The
        # saved calc_state arrays alone are not enough: a fresh calculator
        # holds none of the host statics, so without a rebuild the first
        # scan trace would run with rebuilds silently disabled (or crash).
        # The NBL is derived state — rebuilding from the restored positions
        # is exactly what a fresh start would do.
        if (self._state.calc_state is not None
                and hasattr(self.calculator, "init_state")):
            calc_state = self.calculator.init_state(self._state.system)
            self._state = self._state.replace(calc_state=calc_state)

    def restart_simulation(self, d: Dict[str, Any], soft: bool = False):
        self.load_state_dict(d, soft=soft)
