from . import gather_scatter

__all__ = ["gather_scatter"]
