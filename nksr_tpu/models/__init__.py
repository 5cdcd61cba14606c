from .network import (NKSRNetwork, SparseUNet, PointEncoder, Interpolators,
                      NetworkOutput, MLP)

__all__ = ["NKSRNetwork", "SparseUNet", "PointEncoder", "Interpolators",
           "NetworkOutput", "MLP"]
