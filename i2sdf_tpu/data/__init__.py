from .material import MaterialData
from .plot import PlotData
from .recon import ReconData
from .relight import RelightData, RelightVideoData
from .synth import generate_synthetic_scene

__all__ = ["ReconData", "PlotData", "MaterialData", "RelightData",
           "RelightVideoData", "generate_synthetic_scene"]
