from . import density, embedder, mlp, renderer, sampler

__all__ = ["density", "embedder", "mlp", "renderer", "sampler"]
