from .kernel_field import KernelField, FieldEval
from .neural_field import NeuralField, LayerField, PCNNField, DecoderFn
from .support import InterpolatorFn

__all__ = ["KernelField", "FieldEval", "NeuralField", "LayerField",
           "PCNNField", "DecoderFn", "InterpolatorFn"]
