from .mesh import data_mesh, device_count, local_batch

__all__ = ["data_mesh", "device_count", "local_batch"]
