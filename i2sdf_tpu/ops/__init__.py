from . import compositing, sampling

__all__ = ["compositing", "sampling"]
