"""Real-dataset parity harness (VERDICT r2 #8): the moment Replica data is
mounted, parity against the reference tracker is one command.

Two tiers, both skip-guarded because this environment has no datasets
(zero egress; scripts/download_replica.sh fetches them elsewhere):

1. GT parity — run the first N frames of room0 and assert the ATE floor
   the reference reports (~0.1-0.3 cm on room0, mp_Tracker.py:333-334).
2. Reference-tracker parity — diff our per-frame poses against RECORDED
   reference poses (tests/fixtures/replica_room0_ref_poses.npz, created
   by tools/record_ref_poses.py run alongside the reference repo).

Data location: $GS_REPLICA_ROOT/room0 (the layout download_replica.sh
produces: results/frame*.jpg, results/depth*.png, traj.txt).
"""
import os

import numpy as np
import pytest

ROOT = os.environ.get("GS_REPLICA_ROOT", "/data/Replica")
ROOM0 = os.path.join(ROOT, "room0")
N_FRAMES = 200
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "replica_room0_ref_poses.npz")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOM0),
    reason=f"Replica room0 not found at {ROOM0} (set GS_REPLICA_ROOT; "
           "no datasets exist in the build environment)")


@pytest.fixture(scope="module")
def room0_run():
    import dataclasses

    from gs_icp_slam_tpu.config import replica_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine

    seq = open_dataset("replica", ROOM0).slice(0, N_FRAMES)
    cfg = replica_config(seq.intr)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, fps_cap=None))
    eng = FusedEngine(seq, cfg)
    return eng.run(eval_render=False)


def test_room0_ate_vs_gt(room0_run):
    """Reference reports sub-cm ATE on room0 (README table / paper);
    0.5 cm over the first 200 frames is the parity bar."""
    res = room0_run
    assert res.ate_rmse is not None
    assert res.ate_rmse < 0.005, f"ATE {res.ate_rmse*100:.2f} cm"


def test_room0_poses_vs_reference_tracker(room0_run):
    """Per-frame translation difference against the recorded reference-
    tracker trajectory (not just GT): catches systematic divergence that
    GT-ATE alone can hide."""
    if not os.path.exists(FIXTURE):
        pytest.skip("reference poses not recorded yet — run "
                    "tools/record_ref_poses.py next to the reference repo")
    z = np.load(FIXTURE)
    ref = z["poses"]  # (N, 4, 4) c2w from the reference tracker
    n = min(len(ref), N_FRAMES)
    ours = room0_run.poses[:n]
    # both trackers start from the same GT frame-0 pose, so raw
    # translation RMSE (no alignment) is the honest comparison
    d = np.linalg.norm(ours[:n, :3, 3] - ref[:n, :3, 3], axis=1)
    rmse = float(np.sqrt((d ** 2).mean()))
    assert rmse < 0.01, f"pose divergence vs reference tracker: {rmse:.4f} m"
