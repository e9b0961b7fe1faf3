"""Machine-learning potential calculators for MD.

Parity: ``src/schnetpack/md/calculators/schnetpack_calculator.py`` —
``SchNetPackCalculator`` evaluates a trained ``NeuralNetworkPotential``
inside the MD step; the ensemble variant averages several parameter sets
and reports uncertainties.

TPU notes: the model evaluation is traced into the simulator's scan body —
positions never leave the device.  Stress activation mirrors the
reference's ``activate_model_stress`` (``md/utils/__init__.py:19-86``) by
constructing the potential with ``calc_stress=True``.  The ensemble
calculator vmaps one model over stacked parameter pytrees instead of
looping over model instances.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ... import properties as structure
from ..system import System
from .base import PairwiseMDCalculator


class SchNetPackCalculator(PairwiseMDCalculator):
    def __init__(
        self,
        model,                      # NeuralNetworkPotential
        params,
        cutoff: float,              # model units
        force_key: str = structure.forces,
        energy_unit: str = "eV",
        position_unit: str = "Ang",
        energy_key: Optional[str] = structure.energy,
        stress_key: Optional[str] = None,
        cutoff_shell: float = 0.0,
        required_properties: List[str] = (),
        neighbor_list="all_pairs",  # "all_pairs" | "dense" | "cellblock"
                                    # | "cellblock_atom" | an NBL instance
        precision: Optional[str] = None,   # "bf16" | "mixed" | "f32"
        wgrad: bool = False,
    ):
        super().__init__(
            cutoff=cutoff,
            cutoff_shell=cutoff_shell,
            required_properties=required_properties,
            force_key=force_key,
            energy_unit=energy_unit,
            position_unit=position_unit,
            energy_key=energy_key,
            stress_key=stress_key,
        )
        self.model = model
        self.params = params
        self.nbl_mode = neighbor_list
        if precision is not None:
            # feature precision of the blocked-layout selection kernels.
            # Positions/geometry stay exact f32 regardless (the fused
            # geometry kernel always selects positions in 3x-bf16 pieces);
            # this sets the bf16 split count for the FEATURE selection
            # passes: bf16 = 1 piece (~2x faster messages, ~0.1% force
            # error), mixed = 2 (~16-bit mantissa), f32 = 3 (exact).
            from ...ops import cellblock as _cb

            _cb.PIECES = {"bf16": 1, "mixed": 2, "f32": 3}[precision]
        # MD only differentiates wrt positions — the filter-weight
        # cotangent (gFW) accumulated by the column message backward
        # kernels is dead work here (~11% of the backward at 10k atoms).
        # The flag is read at trace time by the kernels' custom_vjp;
        # training paths (flat/dense layouts, or wgrad=True) keep it.
        from ...ops import cellblock as _cbw

        _cbw.WGRAD = bool(wgrad)
        if not isinstance(neighbor_list, str):
            # a pre-configured NBL instance (reference semantics: the md
            # configs hand the calculator an NeighborListMD object,
            # schnetpack_calculator.py:63-79)
            self.dense_nbl = neighbor_list
        elif neighbor_list == "dense":
            from ..neighborlist_md import DenseNeighborListMD

            # skin = cutoff_shell (model units) converted to MD units
            self.dense_nbl = DenseNeighborListMD(
                cutoff * self.position_conversion,
                skin=max(cutoff_shell, 0.5) * self.position_conversion,
            )
        elif neighbor_list in ("cellblock", "cellblock_atom"):
            from ..neighborlist_md import CellBlockNeighborListMD

            self.dense_nbl = CellBlockNeighborListMD(
                cutoff * self.position_conversion,
                skin=max(cutoff_shell, 0.3) * self.position_conversion,
                layout="column" if neighbor_list == "cellblock" else "atom",
            )
        else:
            self.dense_nbl = None

    # --- dense-NBL state plumbing (scan-carried, host-refreshed) --------
    def init_state(self, system: System):
        if self.dense_nbl is None:
            return None
        self.dense_nbl.build(system)
        return self.dense_nbl.state()

    def device_step_update(self, system: System, calc_state):
        """Traceable per-step neighbor-state refresh, called inside the
        MD scan (skin criterion enforced every step, not per chunk)."""
        if self.dense_nbl is None or calc_state is None:
            return calc_state
        fn = getattr(self.dense_nbl, "device_step_update", None)
        return fn(system, calc_state) if fn is not None else calc_state

    def chunk_probe(self, system: System, calc_state=None):
        """Device scalars the simulator fetches with the chunk logs (one
        round trip): the neighbor list's max squared displacement, plus
        the in-scan rebuild's overflow latch when that path is active."""
        if self.dense_nbl is None:
            return None
        if calc_state is not None and "nbl_build_R" in calc_state:
            import jax.numpy as jnp

            diff = system.positions - calc_state["nbl_build_R"]
            return {
                "disp2": jnp.max(jnp.sum(diff * diff, axis=-1)),
                "ovf": calc_state["nbl_ovf"],
            }
        return self.dense_nbl.displacement2(system)

    def update_state(self, system: System, calc_state, probe=None):
        if self.dense_nbl is None:
            return calc_state
        if getattr(self.dense_nbl, "_state", 0) is None:
            # fresh NBL holding a restored calc_state (restart path that
            # bypassed init_state): rebuild the host statics from scratch
            self.dense_nbl.build(system)
            return self.dense_nbl.state()
        if (calc_state is not None and "nbl_build_R" in calc_state
                and isinstance(probe, dict) and "ovf" in probe):
            # rebuilds happened inside the scan; sync the host shadow so
            # save/restart and a later host rebuild start from the truth
            self.dense_nbl._state = dict(calc_state)
            self.dense_nbl._build_positions_dev = calc_state["nbl_build_R"]
            if bool(probe["ovf"]):
                # Capacity overflow mid-chunk: the in-scan rebuild kept the
                # previous (stale) list for the remainder of the chunk — a
                # bounded window (<= chunk_size steps) during which atoms
                # past skin/2 may miss edges.  Grow the sticky bucket
                # capacities via the host builder and tell the user.
                import warnings

                warnings.warn(
                    "neighbor-list bucket capacity overflowed during a jitted "
                    "MD chunk; the remainder of that chunk ran on the previous "
                    "neighbor list (bounded by chunk_size steps).  Capacities "
                    "were grown — consider a smaller chunk_size or a larger "
                    "bucket_headroom if this recurs.",
                    stacklevel=2,
                )
                self.dense_nbl.build(system)
                return self.dense_nbl.state()
            return calc_state
        if self.dense_nbl.maybe_rebuild(system, disp2=probe):
            return self.dense_nbl.state()
        return calc_state

    def _model_inputs(self, system: System, calc_state=None) -> Dict[str, jax.Array]:
        inputs = self._get_system_molecules(system)
        if calc_state is not None:
            inv = 1.0 / self.position_conversion
            if "cell_order" in calc_state:
                # blocked layouts: model runs in cell-sorted space
                order = calc_state["cell_order"]
                inputs[structure.R] = jnp.take(inputs[structure.R], order, axis=0)
                inputs[structure.Z] = calc_state["cell_Z"]
                inputs[structure.idx_m] = calc_state["cell_idx_m"]
                inputs[structure.atom_mask] = calc_state["cell_atom_mask"]
            if structure.cell_qcol in calc_state:
                # column-bucketed layout
                inputs[structure.cell_qcol] = calc_state[structure.cell_qcol]
                inputs[structure.cell_dcol] = calc_state[structure.cell_dcol]
                inputs[structure.cell_emask] = calc_state[structure.cell_emask]
                inputs[structure.cell_ksz] = calc_state[structure.cell_ksz]
                inputs[structure.cell_coff] = calc_state[structure.cell_coff] * inv
                if structure.cell_coff_fm in calc_state:
                    inputs[structure.cell_coff_fm] = (
                        calc_state[structure.cell_coff_fm] * inv
                    )
                if structure.cell_oh in calc_state:
                    inputs[structure.cell_oh] = calc_state[structure.cell_oh]
            else:
                if structure.cell_qidx in calc_state:
                    inputs[structure.cell_qidx] = calc_state[structure.cell_qidx]
                else:
                    inputs[structure.nbh_rev] = calc_state[structure.nbh_rev]
                inputs[structure.nbh_idx] = calc_state[structure.nbh_idx]
                inputs[structure.nbh_mask] = calc_state[structure.nbh_mask]
                inputs[structure.nbh_offsets] = calc_state[structure.nbh_offsets] * inv
            # the model also expects a (possibly empty) flat pair list
            dt = inputs[structure.R].dtype
            inputs.setdefault(structure.idx_i, jnp.zeros(1, jnp.int32))
            inputs.setdefault(structure.idx_j, jnp.zeros(1, jnp.int32))
            inputs.setdefault(structure.offsets, jnp.full((1, 3), 1e3, dt))
            inputs.setdefault(structure.pair_mask, jnp.zeros(1, dt))
        else:
            inputs.update(self._pair_inputs(system))
        return inputs

    def _calculate_blocked_replicas(self, system: System, calc_state) -> System:
        """Ring-polymer evaluation on the column fast path: one shared
        (union-topology) layout, the model vmapped over the bead axis —
        every bead's messages run through the same fused kernels (the
        Pallas batching rule prepends the bead axis to the kernel grid)."""
        inv = 1.0 / self.position_conversion
        order = calc_state["cell_order"]
        rank = calc_state["cell_rank"]
        n_rep, M = system.n_replicas, system.n_molecules
        Ap = order.shape[0]
        dt = system.positions.dtype

        base = {
            structure.Z: calc_state["cell_Z"],
            structure.idx_m: calc_state["cell_idx_m"],
            structure.atom_mask: calc_state["cell_atom_mask"],
            structure.n_atoms: system.n_atoms_per_mol,
            structure.cell: system.cells[0] * inv,
            structure.pbc: system.pbc,
            structure.mol_mask: jnp.ones(M, dt),
            structure.idx_i: jnp.zeros(1, jnp.int32),
            structure.idx_j: jnp.zeros(1, jnp.int32),
            structure.offsets: jnp.full((1, 3), 1e3, dt),
            structure.pair_mask: jnp.zeros(1, dt),
        }
        for k in (structure.cell_qcol, structure.cell_dcol,
                  structure.cell_emask, structure.cell_ksz):
            base[k] = calc_state[k]
        if structure.cell_oh in calc_state:
            base[structure.cell_oh] = calc_state[structure.cell_oh]
        base[structure.cell_coff] = calc_state[structure.cell_coff] * inv
        if structure.cell_coff_fm in calc_state:
            base[structure.cell_coff_fm] = (
                calc_state[structure.cell_coff_fm] * inv
            )

        R_beads = jnp.take(system.positions * inv, order, axis=1)  # [R,A',3]

        def one(R_r):
            b = dict(base)
            b[structure.R] = R_r
            return self.model.apply(self.params, b, do_postprocessing=False)

        outputs = jax.vmap(one)(R_beads)
        wanted = {self.force_key, self.energy_key, self.stress_key}
        wanted.update(self.required_properties)
        outputs = {
            k: (jnp.take(v, rank, axis=1)
                if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[1] == Ap
                else v)
            for k, v in outputs.items() if k in wanted and v is not None
        }
        updates = {}
        if self.force_key in outputs:
            f = outputs[self.force_key] * self.force_conversion
            updates["forces"] = f * system.atom_mask[None, :, None]
        if self.energy_key is not None and self.energy_key in outputs:
            updates["energy"] = (
                outputs[self.energy_key].reshape(n_rep, M)
                * self.energy_conversion
            )
        return system.replace(**updates)

    def calculate(self, system: System, calc_state=None) -> System:
        if (calc_state is not None and "cell_rank" in calc_state
                and system.n_replicas > 1):
            return self._calculate_blocked_replicas(system, calc_state)
        inputs = self._model_inputs(system, calc_state)
        outputs = self.model.apply(self.params, inputs, do_postprocessing=False)
        if calc_state is not None and "cell_rank" in calc_state:
            # back to canonical atom order for the System update
            rank = calc_state["cell_rank"]
            Ap = inputs[structure.R].shape[0]
            wanted = {self.force_key, self.energy_key, self.stress_key}
            wanted.update(self.required_properties)
            outputs = {
                k: (jnp.take(v, rank, axis=0)
                    if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == Ap
                    else v)
                for k, v in outputs.items() if k in wanted and v is not None
            }
        return self._update_system(system, outputs)


class EnsembleCalculator(SchNetPackCalculator):
    """Mean over an ensemble of parameter sets; writes ``*_uncertainty``
    (std) alongside results (parity: ensemble_calculator.py:14-81).

    ``stacked_params``: pytree whose leaves have a leading ensemble axis
    (use ``stack_ensemble_params``).
    """

    def __init__(self, model, stacked_params, cutoff: float, **kwargs):
        super().__init__(model, stacked_params, cutoff, **kwargs)

    def calculate(self, system: System, calc_state=None) -> System:
        inputs = self._model_inputs(system, calc_state)

        def run_one(params):
            return self.model.apply(params, inputs, do_postprocessing=False)

        outputs = jax.vmap(run_one)(self.params)  # leaves: [E, ...]
        mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), outputs)
        system = self._update_system(system, mean)
        # uncertainty streams: scan-carried System properties, so the
        # FileLogger/TensorBoard host hooks can record them per step
        # (parity: reference ensemble_calculator.py:14-81 property streams)
        R_, A, M = system.n_replicas, system.total_atoms, system.n_molecules
        unc = {}
        for k, conv, shape in (
            (self.force_key, self.force_conversion, (R_, A, 3)),
            (self.energy_key, self.energy_conversion, (R_, M)),
            (self.stress_key, self.stress_conversion, (R_, M, 3, 3)),
        ):
            if k is not None and k in outputs:
                unc[k + "_uncertainty"] = (
                    jnp.std(outputs[k], axis=0).reshape(shape) * conv
                )
        self.last_uncertainty = unc
        return system.replace(properties={**system.properties, **unc})


def stack_ensemble_params(params_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
