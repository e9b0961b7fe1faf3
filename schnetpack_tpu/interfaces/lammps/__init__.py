from .server import LammpsModelServer

__all__ = ["LammpsModelServer"]
