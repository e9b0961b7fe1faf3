"""spkdeploy / spkconvert equivalents.

Parity: ``src/scripts/spkdeploy:16-40`` (strip cast postprocessors, export
an inference artifact with embedded cutoff metadata — the file the LAMMPS
integration consumes) and ``src/scripts/spkconvert`` (set units/atomref
metadata on legacy ASE DBs).

The deployable artifact is a single pickle with the model config, the
parameters, cutoff and unit metadata; ``deploy`` can additionally export a
serialized StableHLO module via ``jax.export`` for non-Python runtimes.

Usage:
    python -m schnetpack_tpu.deploy deploy model_dir=<run dir> out=model.spk \\
        [per_atom_energy=true] [export_stablehlo=true]
    python -m schnetpack_tpu.deploy convert datapath=<db> distance_unit=Ang \\
        property_units="energy:eV,forces:eV/Ang"
"""
from __future__ import annotations

import os
import pickle
import sys
from typing import Dict, Optional


def deploy(
    model_dir: str,
    out: str,
    cutoff: Optional[float] = None,
    per_atom_energy: bool = True,
    export_stablehlo: bool = False,
):
    from .cli import load_model
    from .config.compose import instantiate

    with open(os.path.join(model_dir, "model_config.pkl"), "rb") as f:
        model_cfg = pickle.load(f)

    # enable per-atom energies for spatial-decomposition consumers (LAMMPS)
    if per_atom_energy:
        for om in model_cfg.get("output_modules", []):
            if isinstance(om, dict) and om.get("_target_", "").endswith("Atomwise"):
                om.setdefault("per_atom_output_key", "energy_per_atom")

    model = instantiate(model_cfg)
    from .train import load_pytree

    params = load_pytree(os.path.join(model_dir, "best_model"))

    if cutoff is None:
        cutoff = float(model_cfg.get("representation", {}).get("cutoff", 5.0))

    artifact: Dict = {
        "format": "schnetpack_tpu.deploy/1",
        "model_config": model_cfg,
        "params": params,
        "cutoff": cutoff,
        "model_outputs": model.model_outputs,
    }

    if export_stablehlo:
        import jax

        from . import properties as P
        from .data.loader import PaddingSpec, collate
        from .transform.neighborlist import NeighborListTransform
        import numpy as np

        sample = {
            P.Z: np.array([1, 1]), P.R: np.zeros((2, 3)),
            P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
        }
        sample[P.R][1, 0] = 1.0
        sample = NeighborListTransform(cutoff)(sample)
        batch = collate([sample], PaddingSpec(16, 64, 2))
        batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        exported = jax.export.export(jax.jit(lambda b: model.apply(params, b)))(batch)
        artifact["stablehlo"] = exported.serialize()
        artifact["stablehlo_example_shapes"] = {k: v.shape for k, v in batch.items()}

    with open(out, "wb") as f:
        pickle.dump(artifact, f)
    print(f"deployed {model_dir} -> {out} (cutoff={cutoff})")


def load_deployed(path: str):
    """Load a deployed artifact -> (model, params, metadata)."""
    from .config.compose import instantiate

    with open(path, "rb") as f:
        artifact = pickle.load(f)
    model = instantiate(artifact["model_config"])
    return model, artifact["params"], artifact


def convert(datapath: str, distance_unit: Optional[str] = None,
            property_units: Optional[str] = None, atomrefs_file: Optional[str] = None):
    """Set metadata on a legacy ASE DB (parity: spkconvert)."""
    import numpy as np

    from .data.atoms import ASEAtomsData

    ds = ASEAtomsData(datapath)
    md = {}
    if distance_unit:
        md["_distance_unit"] = distance_unit
    if property_units:
        units = dict(kv.split(":") for kv in property_units.split(","))
        old = ds.metadata.get("_property_unit_dict", {})
        old.update(units)
        md["_property_unit_dict"] = old
    if atomrefs_file:
        refs = dict(np.load(atomrefs_file))
        md["atomrefs"] = {k: np.asarray(v).tolist() for k, v in refs.items()}
    ds.update_metadata(**md)
    print(f"updated metadata of {datapath}: {list(md)}")


def main():
    argv = sys.argv[1:]
    if not argv:
        print(__doc__)
        return
    command, kv = argv[0], dict(a.split("=", 1) for a in argv[1:])
    if command == "deploy":
        deploy(
            kv["model_dir"], kv.get("out", "deployed_model.spk"),
            cutoff=float(kv["cutoff"]) if "cutoff" in kv else None,
            per_atom_energy=kv.get("per_atom_energy", "true").lower() == "true",
            export_stablehlo=kv.get("export_stablehlo", "false").lower() == "true",
        )
    elif command == "convert":
        convert(kv["datapath"], kv.get("distance_unit"),
                kv.get("property_units"), kv.get("atomrefs_file"))
    else:
        raise SystemExit(f"unknown command {command}; use deploy|convert")


if __name__ == "__main__":
    main()
