"""schnetpack_tpu — a TPU-native (JAX/XLA/Pallas) framework for atomistic
machine learning with the capabilities of SchNetPack.

Design principles:
  * one flat ``Dict[str, jax.Array]`` batch convention (`properties`)
  * fixed-shape padded batches with masks — every step is one XLA program
  * pure-functional model core (flax.linen) + ``jax.grad`` response heads
  * on-device MD loop (``lax.scan``) with on-TPU neighbor updates
  * scale-out via ``jax.sharding.Mesh`` + ``shard_map`` (no NCCL/MPI)
"""
__version__ = "0.1.0"

from . import ops, properties, units

__all__ = [
    "ops", "properties", "units", "__version__",
    # lazily importable subpackages (kept out of eager import to keep
    # `import schnetpack_tpu` light): atomistic, data, datasets,
    # interfaces, md, model, nn, parallel, representation, train, transform
]


def __getattr__(name):
    import importlib

    _subpackages = {
        "atomistic", "data", "datasets", "interfaces", "md", "model", "nn",
        "parallel", "representation", "train", "transform",
    }
    if name in _subpackages:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
