from .reconstructor import Reconstructor, get_estimate_normal_preprocess_fn
from .chunking import ChunkedField, weld_vertices

__all__ = ["Reconstructor", "get_estimate_normal_preprocess_fn",
           "ChunkedField", "weld_vertices"]
