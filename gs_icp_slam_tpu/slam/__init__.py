from .engine import SLAMEngine, SLAMResult
from .fused import FusedEngine, FusedStep, make_fused_step
from .state import SLAMState, init_state

__all__ = ["SLAMEngine", "SLAMResult", "FusedEngine", "FusedStep",
           "make_fused_step", "SLAMState", "init_state"]
