from .shard import shard_fluid_solver, make_cell_mesh

__all__ = ["shard_fluid_solver", "make_cell_mesh"]
