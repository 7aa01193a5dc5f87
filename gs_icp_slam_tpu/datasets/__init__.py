from .base import RGBDFrame, RGBDSequence
from .synthetic import SyntheticScene, synthetic_sequence
from .replica import ReplicaSequence
from .tum import TumSequence
from .scene import SceneInfo, load_scene


def open_dataset(dataset_type: str, path: str = "", **kw) -> RGBDSequence:
    """Factory mirroring the reference's dataset_type switch
    (gs_icp_slam.py:135,143 via camera_parameters[8])."""
    if dataset_type == "replica":
        return ReplicaSequence(path, **kw)
    if dataset_type == "tum":
        return TumSequence(path, **kw)
    if dataset_type == "synthetic":
        return synthetic_sequence(**kw)
    raise ValueError(f"Unknown dataset type: {dataset_type!r}")


__all__ = ["RGBDFrame", "RGBDSequence", "SyntheticScene",
           "synthetic_sequence", "ReplicaSequence", "TumSequence",
           "open_dataset", "load_scene", "SceneInfo"]
