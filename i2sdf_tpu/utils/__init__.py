from . import cameras, imaging

__all__ = ["cameras", "imaging"]
