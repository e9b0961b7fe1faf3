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


def int2precision(precision: int):
    """32/64 -> dtype (parity: utils/__init__.py int2precision)."""
    import jax.numpy as jnp

    return {16: jnp.bfloat16, 32: jnp.float32, 64: jnp.float64}[int(precision)]


def required_fields_from_properties(properties_list):
    """External fields needed for the given response properties
    (parity: utils/__init__.py:38-96)."""
    from .. import properties as structure

    fields = []
    for p in properties_list:
        for f in structure.required_external_fields.get(p, []):
            if f not in fields:
                fields.append(f)
    return fields


__all__ = [
    "file_lock", "str2class", "as_dtype", "int2precision",
    "required_fields_from_properties",
    "load_model", "migrate_config", "register_migration",
    "log_hyperparameters", "print_config",
]
