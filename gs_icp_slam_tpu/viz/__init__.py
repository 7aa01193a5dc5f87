from .rerun_logger import RerunLogger

__all__ = ["RerunLogger"]
