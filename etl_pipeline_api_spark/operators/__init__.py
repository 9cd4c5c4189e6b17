from . import aggregations, cleaning, dq

__all__ = ["aggregations", "cleaning", "dq"]
