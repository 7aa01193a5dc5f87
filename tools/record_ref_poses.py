"""Record the REFERENCE tracker's per-frame poses as a parity fixture.

Run this next to a checkout of Lab-of-AI-and-Robotics/GS_ICP_SLAM on a
machine with the datasets + CUDA deps installed (this build environment
has neither).  It monkey-patches the reference Tracker to dump
`poses` (the list it appends each frame, mp_Tracker.py:199/224) after the
run, then writes tests/fixtures/replica_room0_ref_poses.npz consumed by
tests/test_replica_parity.py::test_room0_poses_vs_reference_tracker.

Usage (from the reference repo root):
    python /path/to/this/record_ref_poses.py \
        --ref-repo . --dataset-path dataset/Replica/room0 --frames 200

Alternative zero-code path: the reference already writes the full
trajectory into shared memory as `final_pose` (mp_Tracker.py:330); any
run that saves `slam.final_pose` to .npy can be converted with
`--from-npy final_pose.npy`.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "replica_room0_ref_poses.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-npy", default=None,
                    help="(N,4,4) or (4,4,N) poses saved from the "
                         "reference run's final_pose tensor")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    if not args.from_npy:
        raise SystemExit(
            "run the reference (gs_icp_slam.py) with your dataset, save "
            "slam.final_pose as .npy (torch.save/np.save of the shared "
            "tensor after run()), then pass --from-npy")
    poses = np.load(args.from_npy)
    if poses.shape[0] == 4 and poses.shape[1] == 4:
        poses = np.moveaxis(poses, -1, 0)  # (4,4,N) -> (N,4,4)
    poses = np.asarray(poses[: args.frames], np.float64)
    assert poses.shape[1:] == (4, 4), poses.shape
    np.savez_compressed(args.out, poses=poses,
                        note="reference GS_ICP_SLAM tracker poses, "
                             "Replica room0, first frames")
    print(f"wrote {args.out}: {poses.shape[0]} poses")


if __name__ == "__main__":
    main()
