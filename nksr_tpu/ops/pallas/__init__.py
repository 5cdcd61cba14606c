from .window_basis import window_and_grad_fused

__all__ = ["window_and_grad_fused"]
