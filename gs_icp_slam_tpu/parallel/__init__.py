from .mapping import (make_mesh, shard_map_state, make_parallel_opt_step,
                      ParallelMappingStep)

__all__ = ["make_mesh", "shard_map_state", "make_parallel_opt_step",
           "ParallelMappingStep"]
