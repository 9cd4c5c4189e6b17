from . import gastos, pipeline

__all__ = ["gastos", "pipeline"]
