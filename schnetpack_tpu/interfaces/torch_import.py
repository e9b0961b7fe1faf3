"""Import trained reference (torch) SchNetPack models.

Migration path for users of the reference framework: load a pickled
``NeuralNetworkPotential`` (the ``best_inference_model`` / ``*.model``
artifacts the reference's ModelCheckpoint and spkdeploy produce), map its
weights onto the equivalent flax modules here, and get a jittable
(model, params) pair — no torch in the inference path afterwards.

Unpickling does NOT require the schnetpack package: a meta-path stub
fabricates empty ``nn.Module`` subclasses for every ``schnetpack.*`` class
(pickle restores instances without calling ``__init__``), which is enough
to read the parameter tree and the hyperparameters stored on the modules.

Supported representations: PaiNN, SchNet.  The mapping covers the
representation, Atomwise output heads, and the AddOffsets postprocessor
(atomref + mean).
"""
from __future__ import annotations

import importlib.abc
import importlib.machinery
import sys
import types
from typing import Dict, Optional, Tuple

import numpy as np

_cache: Dict[str, type] = {}


def _stub_class(attr: str):
    if attr not in _cache:
        import torch.nn as nn

        _cache[attr] = type(attr, (nn.Module,), {})
    return _cache[attr]


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__path__ = []
        mod.__getattr__ = _stub_class
        return mod

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "schnetpack" or name.startswith("schnetpack."):
            if name in sys.modules:
                return None
            return importlib.machinery.ModuleSpec(name, _StubLoader(), is_package=True)
        return None


def load_torch_model(path: str):
    """Unpickle a reference model -> (numpy state dict, info dict)."""
    import torch

    finder = _StubFinder()
    sys.meta_path.insert(0, finder)
    try:
        m = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        sys.meta_path.remove(finder)

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    rep = m.representation
    # AddOffsets may sit at any index in the postprocessor list — scan for
    # its buffers instead of assuming index 1 (reference: the postprocessor
    # order is config-dependent).
    atomref = mean = None
    has_postproc = any(k.startswith("postprocessors.") for k in sd)
    for k, v in sd.items():
        if k.startswith("postprocessors.") and k.endswith(".atomref"):
            atomref = v
        elif k.startswith("postprocessors.") and k.endswith(".mean"):
            mean = v
    if has_postproc and atomref is None and mean is None:
        import warnings

        warnings.warn(
            "torch model has postprocessors but no atomref/mean buffers were "
            "found; energy offsets will not be applied", stacklevel=2
        )
    info = {
        "representation": type(rep).__name__,
        "cutoff": float(sd.get("representation.cutoff_fn.cutoff", [5.0])[0]),
        "n_rbf": int(sd["representation.radial_basis.offsets"].shape[0])
        if "representation.radial_basis.offsets" in sd else 20,
        "n_atom_basis": int(sd["representation.embedding.weight"].shape[1]),
        "max_z": int(sd["representation.embedding.weight"].shape[0]) - 1,
        "atomref": atomref,
        "mean": mean,
    }
    # count interaction blocks (SchNet/PaiNN use .interactions, SO3net
    # uses per-role module lists)
    blocks = "interactions" if any(
        k.startswith("representation.interactions.") for k in sd
    ) else "so3convs"
    n_int = 0
    while any(k.startswith(f"representation.{blocks}.{n_int}.") for k in sd):
        n_int += 1
    info["n_interactions"] = n_int or 3
    return sd, info


def _set(params_flat, path: Tuple[str, ...], value: np.ndarray, transpose=False):
    target = params_flat[path]
    v = value.T if transpose else value
    if target.shape != v.shape:
        raise ValueError(f"shape mismatch at {'/'.join(path)}: {target.shape} vs {v.shape}")
    params_flat[path] = v.astype(np.asarray(target).dtype)


def import_painn(path: str, energy_key: str = "energy", calc_forces: bool = True):
    """(model, params) from a reference-trained PaiNN potential."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from .. import properties as P
    from ..atomistic import Atomwise, Forces, PairwiseDistances
    from ..data.loader import PaddingSpec, collate
    from ..model import NeuralNetworkPotential
    from ..representation import PaiNN
    from ..transform import AddOffsets
    from ..transform.neighborlist import NeighborListTransform

    sd, info = load_torch_model(path)
    if info["representation"] != "PaiNN":
        raise ValueError(f"not a PaiNN model: {info['representation']}")

    F = info["n_atom_basis"]
    n_int = info["n_interactions"]
    postprocessors = []
    if info["atomref"] is not None:
        atomref = np.zeros(101)
        atomref[: len(info["atomref"])] = info["atomref"]
        postprocessors.append(
            AddOffsets(energy_key, add_mean=info["mean"] is not None,
                       add_atomrefs=True, atomrefs=atomref,
                       property_mean=float(info["mean"]) if info["mean"] is not None else None)
        )

    pot = NeuralNetworkPotential(
        representation=PaiNN(
            n_atom_basis=F, n_interactions=n_int, n_rbf=info["n_rbf"],
            cutoff=info["cutoff"], max_z=info["max_z"],
            activation=jax.nn.silu, shared_filters=False,
        ),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=energy_key, activation=jax.nn.silu),
            *([Forces(energy_key=energy_key)] if calc_forces else []),
        ],
        postprocessors=postprocessors,
    )

    # initialize to get the parameter tree, then overwrite
    probe = {
        P.Z: np.array([6, 1]), P.R: np.array([[0.0, 0, 0], [1.0, 0, 0]]),
        P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
    }
    probe = NeighborListTransform(info["cutoff"])(probe)
    batch = collate([probe], PaddingSpec(8, 16, 2))
    params = pot.init(jax.random.PRNGKey(0), batch)
    flat = flatten_dict(params["params"])

    rep = ("representation",)
    _set(flat, rep + ("embedding", "embedding"), sd["representation.embedding.weight"])
    _set(flat, rep + ("filter_net", "linear", "kernel"),
         sd["representation.filter_net.weight"], transpose=True)
    _set(flat, rep + ("filter_net", "linear", "bias"),
         sd["representation.filter_net.bias"])
    for t in range(n_int):
        base = f"representation.interactions.{t}.interatomic_context_net"
        _set(flat, rep + (f"interaction_{t}", "ctx_0", "linear", "kernel"),
             sd[f"{base}.0.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "ctx_0", "linear", "bias"),
             sd[f"{base}.0.bias"])
        _set(flat, rep + (f"interaction_{t}", "ctx_1", "linear", "kernel"),
             sd[f"{base}.1.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "ctx_1", "linear", "bias"),
             sd[f"{base}.1.bias"])
        mbase = f"representation.mixings.{t}" if f"representation.mixings.{t}.mu_channel_mix.weight" in sd else f"representation.mixing.{t}"
        _set(flat, rep + (f"mixing_{t}", "channel_mix", "linear", "kernel"),
             sd[f"{mbase}.mu_channel_mix.weight"], transpose=True)
        _set(flat, rep + (f"mixing_{t}", "intra_0", "linear", "kernel"),
             sd[f"{mbase}.intraatomic_context_net.0.weight"], transpose=True)
        _set(flat, rep + (f"mixing_{t}", "intra_0", "linear", "bias"),
             sd[f"{mbase}.intraatomic_context_net.0.bias"])
        _set(flat, rep + (f"mixing_{t}", "intra_1", "linear", "kernel"),
             sd[f"{mbase}.intraatomic_context_net.1.weight"], transpose=True)
        _set(flat, rep + (f"mixing_{t}", "intra_1", "linear", "bias"),
             sd[f"{mbase}.intraatomic_context_net.1.bias"])

    _import_atomwise(flat, sd, prefix="output_modules.0.outnet")
    params = {"params": unflatten_dict(flat)}
    params = jax.tree.map(jnp.asarray, params)
    return pot, params, info


def _import_atomwise(flat, sd, prefix: str):
    from flax.traverse_util import flatten_dict

    head = ("output_modules_0", "outnet")
    i = 0
    while f"{prefix}.{i}.weight" in sd:
        _set(flat, head + (f"dense_{i}", "linear", "kernel"),
             sd[f"{prefix}.{i}.weight"], transpose=True)
        _set(flat, head + (f"dense_{i}", "linear", "bias"), sd[f"{prefix}.{i}.bias"])
        i += 1


def import_schnet(path: str, energy_key: str = "energy", calc_forces: bool = True,
                  activation=None, head_activation=None):
    """(model, params) from a reference-trained SchNet potential.

    The activation is not recoverable from the state dict.  The reference
    SchNet defaults to shifted_softplus (ref representation/schnet.py:22)
    and its Atomwise head to silu (ref atomistic/atomwise.py:27); pass
    ``activation`` / ``head_activation`` for models trained with overrides.
    """
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from .. import properties as P
    from ..atomistic import Atomwise, Forces, PairwiseDistances
    from ..data.loader import PaddingSpec, collate
    from ..model import NeuralNetworkPotential
    from ..representation import SchNet
    from ..transform import AddOffsets
    from ..transform.neighborlist import NeighborListTransform

    sd, info = load_torch_model(path)
    if info["representation"] != "SchNet":
        raise ValueError(f"not a SchNet model: {info['representation']}")
    F = info["n_atom_basis"]
    n_int = info["n_interactions"]

    postprocessors = []
    if info["atomref"] is not None:
        atomref = np.zeros(101)
        atomref[: len(info["atomref"])] = info["atomref"]
        postprocessors.append(
            AddOffsets(energy_key, add_mean=info["mean"] is not None,
                       add_atomrefs=True, atomrefs=atomref,
                       property_mean=float(info["mean"]) if info["mean"] is not None else None)
        )
    from ..ops.activations import shifted_softplus

    pot = NeuralNetworkPotential(
        representation=SchNet(
            n_atom_basis=F, n_interactions=n_int, n_rbf=info["n_rbf"],
            cutoff=info["cutoff"], max_z=info["max_z"],
            activation=activation or shifted_softplus,
        ),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=energy_key,
                     activation=head_activation or jax.nn.silu),
            *([Forces(energy_key=energy_key)] if calc_forces else []),
        ],
        postprocessors=postprocessors,
    )
    probe = {
        P.Z: np.array([6, 1]), P.R: np.array([[0.0, 0, 0], [1.0, 0, 0]]),
        P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
    }
    probe = NeighborListTransform(info["cutoff"])(probe)
    batch = collate([probe], PaddingSpec(8, 16, 2))
    params = pot.init(jax.random.PRNGKey(0), batch)
    flat = flatten_dict(params["params"])
    rep = ("representation",)
    _set(flat, rep + ("embedding", "embedding"), sd["representation.embedding.weight"])
    for t in range(n_int):
        b = f"representation.interactions.{t}"
        _set(flat, rep + (f"interaction_{t}", "filter_0", "linear", "kernel"),
             sd[f"{b}.filter_network.0.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "filter_0", "linear", "bias"),
             sd[f"{b}.filter_network.0.bias"])
        _set(flat, rep + (f"interaction_{t}", "filter_1", "linear", "kernel"),
             sd[f"{b}.filter_network.1.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "filter_1", "linear", "bias"),
             sd[f"{b}.filter_network.1.bias"])
        _set(flat, rep + (f"interaction_{t}", "in2f", "linear", "kernel"),
             sd[f"{b}.in2f.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "f2out_0", "linear", "kernel"),
             sd[f"{b}.f2out.0.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "f2out_0", "linear", "bias"),
             sd[f"{b}.f2out.0.bias"])
        _set(flat, rep + (f"interaction_{t}", "f2out_1", "linear", "kernel"),
             sd[f"{b}.f2out.1.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "f2out_1", "linear", "bias"),
             sd[f"{b}.f2out.1.bias"])
    _import_atomwise(flat, sd, prefix="output_modules.0.outnet")
    params = {"params": unflatten_dict(flat)}
    params = jax.tree.map(jnp.asarray, params)
    return pot, params, info


def import_so3net(path: str, energy_key: str = "energy",
                  calc_forces: bool = True, head_activation=None):
    """(model, params) from a reference-trained SO3net potential.

    Conventions verified against the reference (tests/test_so3_import.py):
    the real-Ylm bases agree elementwise, and the parity-invariant real
    CG tensors agree elementwise (ref nn/ops/so3.py
    generate_clebsch_gordan_rsh), so weights transfer directly.
    """
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from .. import properties as P
    from ..atomistic import Atomwise, Forces, PairwiseDistances
    from ..data.loader import PaddingSpec, collate
    from ..model import NeuralNetworkPotential
    from ..representation import SO3net
    from ..transform import AddOffsets
    from ..transform.neighborlist import NeighborListTransform

    sd, info = load_torch_model(path)
    if info["representation"] != "SO3net":
        raise ValueError(f"not a SO3net model: {info['representation']}")
    F = info["n_atom_basis"]
    n_int = info["n_interactions"]
    lmax = sd["representation.so3convs.0.filternet.weight"].shape[0] // F - 1

    postprocessors = []
    if info["atomref"] is not None:
        atomref = np.zeros(101)
        atomref[: len(info["atomref"])] = info["atomref"]
        postprocessors.append(
            AddOffsets(energy_key, add_mean=info["mean"] is not None,
                       add_atomrefs=True, atomrefs=atomref,
                       property_mean=float(info["mean"]) if info["mean"] is not None else None)
        )

    pot = NeuralNetworkPotential(
        representation=SO3net(
            n_atom_basis=F, n_interactions=n_int, lmax=lmax,
            n_rbf=info["n_rbf"], cutoff=info["cutoff"], max_z=info["max_z"],
        ),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=energy_key,
                     activation=head_activation or jax.nn.silu),
            *([Forces(energy_key=energy_key)] if calc_forces else []),
        ],
        postprocessors=postprocessors,
    )
    probe = {
        P.Z: np.array([6, 1]), P.R: np.array([[0.0, 0, 0], [1.0, 0, 0]]),
        P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
    }
    probe = NeighborListTransform(info["cutoff"])(probe)
    batch = collate([probe], PaddingSpec(8, 16, 2))
    params = pot.init(jax.random.PRNGKey(0), batch)
    flat = flatten_dict(params["params"])
    rep = ("representation",)
    _set(flat, rep + ("embedding", "embedding"),
         sd["representation.embedding.weight"])
    for t in range(n_int):
        _set(flat, rep + (f"so3conv_{t}", "filternet", "linear", "kernel"),
             sd[f"representation.so3convs.{t}.filternet.weight"],
             transpose=True)
        _set(flat, rep + (f"so3conv_{t}", "filternet", "linear", "bias"),
             sd[f"representation.so3convs.{t}.filternet.bias"])
        for role, ours in (("mixings1", "mix1"), ("mixings2", "mix2"),
                           ("mixings3", "mix3")):
            _set(flat, rep + (f"{ours}_{t}", "linear", "kernel"),
                 sd[f"representation.{role}.{t}.weight"], transpose=True)
        _set(flat, rep + (f"gate_{t}", "scaling", "linear", "kernel"),
             sd[f"representation.gatings.{t}.scaling.weight"], transpose=True)
        _set(flat, rep + (f"gate_{t}", "scaling", "linear", "bias"),
             sd[f"representation.gatings.{t}.scaling.bias"])
    _import_atomwise(flat, sd, prefix="output_modules.0.outnet")
    params = {"params": unflatten_dict(flat)}
    params = jax.tree.map(jnp.asarray, params)
    return pot, params, info


def import_field_schnet(path: str, energy_key: str = "energy",
                        calc_forces: bool = True, activation=None,
                        response_properties=None):
    """(model, params) from a reference-trained FieldSchNet potential.

    Maps the representation (reference representation/field_schnet.py:
    19-247 module tree: interactions, field_interaction,
    dipole_interaction, dipole_update, initial_dipole_update,
    nmm_embedding) and the Atomwise head.  External fields are discovered
    from the state-dict keys.
    """
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from .. import properties as P
    from ..atomistic import Atomwise, Forces, PairwiseDistances
    from ..data.loader import PaddingSpec, collate
    from ..model import NeuralNetworkPotential
    from ..ops.activations import shifted_softplus
    from ..representation import FieldSchNet
    from ..transform import AddOffsets
    from ..transform.neighborlist import NeighborListTransform

    sd, info = load_torch_model(path)
    if info["representation"] != "FieldSchNet":
        raise ValueError(f"not a FieldSchNet model: {info['representation']}")
    F = info["n_atom_basis"]
    n_int = info["n_interactions"]
    fields = sorted({
        k.split(".")[3]
        for k in sd
        if k.startswith("representation.initial_dipole_update.transform.")
        and k.endswith(".weight")
    } | {
        k.split(".")[4]
        for k in sd
        if k.startswith("representation.dipole_update.")
        and ".transform." in k and k.endswith(".weight")
    })
    # ModuleDict iteration order == insertion order == external_fields
    # list order in the reference; sd key sets do not preserve it, but the
    # per-field weights are keyed by name so order only affects summation
    # order (commutative).

    postprocessors = []
    if info["atomref"] is not None:
        atomref = np.zeros(101)
        atomref[: len(info["atomref"])] = info["atomref"]
        postprocessors.append(
            AddOffsets(energy_key, add_mean=info["mean"] is not None,
                       add_atomrefs=True, atomrefs=atomref,
                       property_mean=float(info["mean"]) if info["mean"] is not None else None)
        )

    pot = NeuralNetworkPotential(
        representation=FieldSchNet(
            n_atom_basis=F, n_interactions=n_int, n_rbf=info["n_rbf"],
            cutoff=info["cutoff"], max_z=info["max_z"],
            external_fields=tuple(fields),
            response_properties=response_properties,
            activation=activation or shifted_softplus,
        ),
        input_modules=[PairwiseDistances()],
        output_modules=[
            Atomwise(output_key=energy_key, activation=jax.nn.silu),
            *([Forces(energy_key=energy_key)] if calc_forces else []),
        ],
        postprocessors=postprocessors,
    )
    probe = {
        P.Z: np.array([6, 1]), P.R: np.array([[0.0, 0, 0], [1.0, 0, 0]]),
        P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
    }
    probe = NeighborListTransform(info["cutoff"])(probe)
    batch = collate([probe], PaddingSpec(8, 16, 2))
    for f in fields:
        batch[f] = np.zeros((2, 3), np.float32)
    params = pot.init(jax.random.PRNGKey(0), batch)
    flat = flatten_dict(params["params"])
    rep = ("representation",)
    _set(flat, rep + ("embedding", "embedding"),
         sd["representation.embedding.weight"])

    def tag(f):
        return f.strip("_")

    for f in fields:
        _set(flat, rep + ("initial_dipole_update", f"transform_{tag(f)}",
                          "linear", "kernel"),
             sd[f"representation.initial_dipole_update.transform.{f}.weight"],
             transpose=True)
    if "representation.nmm_embedding.gyromagnetic_ratio.weight" in sd:
        g = sd["representation.nmm_embedding.gyromagnetic_ratio.weight"]
        tgt = flat[rep + ("nmm_embedding", "gyromagnetic", "embedding")]
        gg = np.zeros_like(np.asarray(tgt))
        gg[: len(g)] = g
        flat[rep + ("nmm_embedding", "gyromagnetic", "embedding")] = gg
        _set(flat, rep + ("nmm_embedding", "delta", "linear", "kernel"),
             sd["representation.nmm_embedding.vector_mapping.weight"],
             transpose=True)
    for t in range(n_int):
        b = f"representation.interactions.{t}"
        _set(flat, rep + (f"interaction_{t}", "filter_0", "linear", "kernel"),
             sd[f"{b}.filter_network.0.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "filter_0", "linear", "bias"),
             sd[f"{b}.filter_network.0.bias"])
        _set(flat, rep + (f"interaction_{t}", "filter_1", "linear", "kernel"),
             sd[f"{b}.filter_network.1.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "filter_1", "linear", "bias"),
             sd[f"{b}.filter_network.1.bias"])
        _set(flat, rep + (f"interaction_{t}", "in2f", "linear", "kernel"),
             sd[f"{b}.in2f.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "f2out_0", "linear", "kernel"),
             sd[f"{b}.f2out.0.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "f2out_0", "linear", "bias"),
             sd[f"{b}.f2out.0.bias"])
        _set(flat, rep + (f"interaction_{t}", "f2out_1", "linear", "kernel"),
             sd[f"{b}.f2out.1.weight"], transpose=True)
        _set(flat, rep + (f"interaction_{t}", "f2out_1", "linear", "bias"),
             sd[f"{b}.f2out.1.bias"])
        for f in fields:
            tg = tag(f)
            fb = f"representation.field_interaction.{t}.f2out.{f}"
            _set(flat, rep + (f"field_inter_{t}", f"f2out_{tg}", "linear",
                              "kernel"), sd[f"{fb}.weight"], transpose=True)
            _set(flat, rep + (f"field_inter_{t}", f"f2out_{tg}", "linear",
                              "bias"), sd[f"{fb}.bias"])
            db = f"representation.dipole_interaction.{t}"
            _set(flat, rep + (f"dipole_inter_{t}", f"filter_{tg}_0",
                              "linear", "kernel"),
                 sd[f"{db}.filter_network.{f}.0.weight"], transpose=True)
            _set(flat, rep + (f"dipole_inter_{t}", f"filter_{tg}_0",
                              "linear", "bias"),
                 sd[f"{db}.filter_network.{f}.0.bias"])
            _set(flat, rep + (f"dipole_inter_{t}", f"filter_{tg}_1",
                              "linear", "kernel"),
                 sd[f"{db}.filter_network.{f}.1.weight"], transpose=True)
            _set(flat, rep + (f"dipole_inter_{t}", f"filter_{tg}_1",
                              "linear", "bias"),
                 sd[f"{db}.filter_network.{f}.1.bias"])
            _set(flat, rep + (f"dipole_inter_{t}", f"transform_{tg}",
                              "linear", "kernel"),
                 sd[f"{db}.transform.{f}.weight"], transpose=True)
            _set(flat, rep + (f"dipole_inter_{t}", f"transform_{tg}",
                              "linear", "bias"),
                 sd[f"{db}.transform.{f}.bias"])
            _set(flat, rep + (f"dipole_update_{t}", f"transform_{tg}",
                              "linear", "kernel"),
                 sd[f"representation.dipole_update.{t}.transform.{f}.weight"],
                 transpose=True)
    _import_atomwise(flat, sd, prefix="output_modules.0.outnet")
    params = {"params": unflatten_dict(flat)}
    params = jax.tree.map(jnp.asarray, params)
    info["external_fields"] = fields
    return pot, params, info


def import_torch_model(path: str, **kwargs):
    """Dispatch on the representation class of the pickled model."""
    _, info = load_torch_model(path)
    if info["representation"] == "PaiNN":
        return import_painn(path, **kwargs)
    if info["representation"] == "SchNet":
        return import_schnet(path, **kwargs)
    if info["representation"] == "SO3net":
        return import_so3net(path, **kwargs)
    if info["representation"] == "FieldSchNet":
        return import_field_schnet(path, **kwargs)
    raise NotImplementedError(
        f"weight import for {info['representation']} is not supported yet"
    )
