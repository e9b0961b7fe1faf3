"""Host-side logging / checkpoint hooks.

Parity: ``src/schnetpack/md/simulation_hooks/callback_hooks.py`` —
``FileLogger`` (buffered HDF5 with ``MoleculeStream``/``PropertyStream``
groups, SWMR, restart append), ``Checkpoint`` (periodic state snapshots),
and a TensorBoard hook.  The simulator hands these hooks stacked numpy
chunks, so all IO happens off the device between scan chunks.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ...units import md_units
from .basic_hooks import SimulationHook


class Checkpoint(SimulationHook):
    """Periodic pickle of ``simulator.state_dict()``
    (parity: callback_hooks.py:24-58)."""

    def __init__(self, checkpoint_file: str, every_n_steps: int = 1000):
        self.checkpoint_file = checkpoint_file
        self.every_n_steps = every_n_steps
        self._last_saved = -1

    def process_chunk(self, simulator, logs, start_step):
        end_step = start_step + next(iter(logs.values())).shape[0]
        if end_step // self.every_n_steps > self._last_saved:
            self._last_saved = end_step // self.every_n_steps
            os.makedirs(os.path.dirname(os.path.abspath(self.checkpoint_file)), exist_ok=True)
            with open(self.checkpoint_file, "wb") as f:
                pickle.dump(simulator.state_dict(), f)

    def on_simulation_end(self, simulator):
        with open(self.checkpoint_file, "wb") as f:
            pickle.dump(simulator.state_dict(), f)


class FileLogger(SimulationHook):
    """Buffered HDF5 trajectory writer (parity: callback_hooks.py:433-572).

    Creates two groups:
      * ``molecules`` — packed positions/velocities/forces/cells/energies
        per step (MoleculeStream, callback_hooks.py:194-309), with metadata
        attrs incl. time step and masses;
      * ``properties`` — per-molecule scalar/tensor properties
        (PropertyStream, callback_hooks.py:310-424).
    """

    def __init__(
        self,
        filename: str,
        buffer_size: int = 100,  # kept for API parity; chunking handled by simulator
        data_streams: Sequence[str] = ("molecules", "properties"),
        every_n_steps: int = 1,
        precision: int = 32,
        restart: bool = False,
    ):
        self.filename = filename
        self.every_n_steps = every_n_steps
        self.data_streams = data_streams
        self.dtype = np.float32 if precision == 32 else np.float64
        self.restart = restart
        self._file = None

    def on_simulation_start(self, simulator):
        import h5py

        if os.path.exists(self.filename) and not self.restart and simulator.n_simulated == 0:
            raise FileExistsError(
                f"{self.filename} exists; set restart=True to append"
            )
        os.makedirs(os.path.dirname(os.path.abspath(self.filename)) or ".", exist_ok=True)
        mode = "a" if (self.restart and os.path.exists(self.filename)) else "w"
        self._file = h5py.File(self.filename, mode, libver="latest")
        sys = simulator.system
        if "molecules" not in self._file:
            g = self._file.create_group("molecules")
            g.attrs["time_step"] = simulator.integrator.dt * self.every_n_steps
            g.attrs["n_replicas"] = sys.n_replicas
            g.attrs["n_molecules"] = sys.n_molecules
            g.attrs["total_atoms"] = sys.total_atoms
            g.attrs["masses"] = np.asarray(sys.masses)
            g.attrs["atomic_numbers"] = np.asarray(sys.atomic_numbers)
            g.attrs["idx_m"] = np.asarray(sys.idx_m)
            g.attrs["pbc"] = np.asarray(sys.pbc)
            self._file.create_group("properties")
        try:
            self._file.swmr_mode = True
        except Exception:
            pass

    def _append(self, group, name, data):
        data = np.asarray(data, self.dtype)
        if name not in group:
            group.create_dataset(
                name, data=data, maxshape=(None,) + data.shape[1:],
                chunks=(min(len(data), 128),) + data.shape[1:],
            )
        else:
            ds = group[name]
            n0 = ds.shape[0]
            ds.resize(n0 + data.shape[0], axis=0)
            ds[n0:] = data

    def process_chunk(self, simulator, logs, start_step):
        if self._file is None:
            return
        sel = slice(None, None, self.every_n_steps)
        mol_keys = ("positions", "momenta", "forces", "cells")
        prop_keys = [k for k in logs if k not in mol_keys]
        for k in mol_keys:
            if k in logs:
                self._append(self._file["molecules"], k, logs[k][sel])
        for k in prop_keys:
            self._append(self._file["properties"], k, logs[k][sel])
        self._file.flush()

    def on_simulation_end(self, simulator):
        if self._file is not None:
            self._file.close()
            self._file = None


class TensorBoardLoggerMD(SimulationHook):
    """Temperature/energy/pressure curves to TensorBoard
    (parity: callback_hooks.py:577-718)."""

    def __init__(self, log_file: str, every_n_steps: int = 10):
        self.log_file = log_file
        self.every_n_steps = every_n_steps
        self._writer = None

    def on_simulation_start(self, simulator):
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(self.log_file)
        except ImportError:
            self._writer = None

    def process_chunk(self, simulator, logs, start_step):
        if self._writer is None:
            return
        n = next(iter(logs.values())).shape[0]
        for i in range(0, n, self.every_n_steps):
            step = start_step + i
            if "temperature" in logs:
                self._writer.add_scalar(
                    "temperature", float(np.mean(logs["temperature"][i])), step
                )
            if "energy" in logs:
                self._writer.add_scalar(
                    "potential_energy", float(np.sum(logs["energy"][i])), step
                )
            if "kinetic_energy" in logs:
                self._writer.add_scalar(
                    "kinetic_energy", float(np.sum(logs["kinetic_energy"][i])), step
                )

    def on_simulation_end(self, simulator):
        if self._writer is not None:
            self._writer.close()
