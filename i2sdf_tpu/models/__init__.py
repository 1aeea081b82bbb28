from . import density, embedder, material, mlp, renderer, sampler

__all__ = ["density", "embedder", "material", "mlp", "renderer",
           "sampler"]
