from .gaussian_map import (GaussianMap, empty_map, add_gaussians,
                           densify_clone_split,
                           prune_large_and_transparent, trackable_export,
                           compact, map_params, with_params)
from .optimizer import AdamState, adam_init, adam_step, map_lr_tree

__all__ = [
    "GaussianMap", "empty_map", "add_gaussians", "densify_clone_split",
    "prune_large_and_transparent", "trackable_export", "compact",
    "map_params", "with_params",
    "AdamState", "adam_init", "adam_step", "map_lr_tree",
]
