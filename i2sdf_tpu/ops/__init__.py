from . import activations, clustering, compositing, sampling

__all__ = ["activations", "clustering", "compositing", "sampling"]
