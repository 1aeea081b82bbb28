from .recon import ReconData
from .synth import generate_synthetic_scene

__all__ = ["ReconData", "generate_synthetic_scene"]
