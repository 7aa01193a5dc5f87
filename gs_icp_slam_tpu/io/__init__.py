from .ply import save_ply, load_ply
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = ["save_ply", "load_ply", "save_checkpoint", "load_checkpoint"]
