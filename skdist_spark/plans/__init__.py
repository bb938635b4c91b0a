from . import behavior, lint, ml_queries, tpch, windows

__all__ = ["behavior", "lint", "ml_queries", "tpch", "windows"]
