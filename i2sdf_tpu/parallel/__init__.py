from .mesh import (initialize_multihost, make_mesh, replicate_params,
                   shard_batch)

__all__ = ["initialize_multihost", "make_mesh", "replicate_params",
           "shard_batch"]
