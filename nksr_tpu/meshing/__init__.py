from .dual_mc import extract_dual_mesh, TriangleMesh, DeviceMesh

__all__ = ["extract_dual_mesh", "TriangleMesh", "DeviceMesh"]
