from . import interpolate, mesh, mesh_io, render

__all__ = ["interpolate", "mesh", "mesh_io", "render"]
