from .compatibility import load_model, migrate_config, register_migration
from .locking import file_lock
from .script import log_hyperparameters, print_config


def str2class(path: str):
    """Resolve a dotted path like ``schnetpack_tpu.nn.Dense`` to the object."""
    import importlib

    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def as_dtype(name: str):
    import jax.numpy as jnp

    return {
        "float32": jnp.float32,
        "float64": jnp.float64,
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "int32": jnp.int32,
        "int64": jnp.int64,
    }[name]


__all__ = [
    "file_lock", "str2class", "as_dtype",
    "load_model", "migrate_config", "register_migration",
    "log_hyperparameters", "print_config",
]
