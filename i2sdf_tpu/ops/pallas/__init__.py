from .fused_bg import bg_core_fused
from .fused_grad import sdf_outputs_fused_grad
from .fused_mlp import fused_sdf_fn, fused_sdf_mlp
from .fused_outputs import fused_sdf_outputs
from .sampler_round import make_round_impl, sampler_round_pallas

__all__ = ["fused_sdf_mlp", "fused_sdf_fn", "fused_sdf_outputs",
           "sampler_round_pallas", "make_round_impl",
           "sdf_outputs_fused_grad", "bg_core_fused"]
