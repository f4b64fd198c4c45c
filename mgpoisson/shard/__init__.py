from mgpoisson.shard.mesh import build_mesh, mesh_shape_for
from mgpoisson.shard.gspmd import make_constrain, level_partition_spec

__all__ = ["build_mesh", "mesh_shape_for", "make_constrain",
           "level_partition_spec"]
