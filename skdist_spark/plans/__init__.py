from . import tpch, windows

__all__ = ["tpch", "windows"]
