from .shard import (make_cell_mesh, shard_fluid_solver, shard_solid_solver,
                    sharded_element_cg, sharded_insim_newton)

__all__ = ["shard_fluid_solver", "shard_solid_solver",
           "sharded_element_cg", "sharded_insim_newton", "make_cell_mesh"]
