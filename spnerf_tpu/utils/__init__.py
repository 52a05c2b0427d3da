from .resize import resize_bilinear, resize_nearest

__all__ = ["resize_bilinear", "resize_nearest"]
