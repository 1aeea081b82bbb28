from .fused_mlp import fused_sdf_fn, fused_sdf_mlp

__all__ = ["fused_sdf_mlp", "fused_sdf_fn"]
