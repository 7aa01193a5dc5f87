"""Dataset loaders: synthetic geometry consistency, Replica/TUM file-format
parsing against tiny generated fixtures, ATE evaluation."""
import os

import numpy as np
import pytest

from gs_icp_slam_tpu.datasets import (ReplicaSequence, TumSequence,
                                      synthetic_sequence, open_dataset)
from gs_icp_slam_tpu.eval import ate_rmse, align_horn


def test_synthetic_depth_consistency():
    """Unprojected depth must land on the box surface, in any frame."""
    seq = synthetic_sequence(width=80, height=60, num_frames=5)
    half = np.asarray(seq.scene.half_extent)
    for i in [0, 4]:
        fr = seq.frame(i)
        z = fr.depth.astype(np.float64) / seq.intr.depth_scale
        assert (z > 0).all()
        u, v = np.meshgrid(np.arange(80), np.arange(60))
        xn = (u - seq.intr.cx) / seq.intr.fx
        yn = (v - seq.intr.cy) / seq.intr.fy
        pts_c = np.stack([xn * z, yn * z, z], -1).reshape(-1, 3)
        c2w = fr.gt_c2w
        pts_w = pts_c @ c2w[:3, :3].T + c2w[:3, 3]
        # every point on (at least) one box face
        dist_to_face = np.min(np.abs(np.abs(pts_w) - half), axis=-1)
        assert dist_to_face.max() < 1e-6
        assert fr.rgb.dtype == np.uint8 and fr.rgb.shape == (60, 80, 3)


def test_synthetic_poses_smooth():
    seq = synthetic_sequence(width=32, height=24, num_frames=20)
    poses = seq.gt_poses
    steps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    assert steps.max() < 0.05  # small inter-frame motion (trackable)
    # rotations orthonormal
    R = poses[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-9)


def _write_replica_fixture(root):
    from PIL import Image
    os.makedirs(root / "images")
    os.makedirs(root / "depth_images")
    rng = np.random.default_rng(0)
    poses = []
    for i in range(3):
        rgb = rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(root / "images" / f"frame{i:06d}.jpg")
        depth = rng.integers(100, 60000, (8, 10)).astype(np.uint16)
        Image.fromarray(depth, mode="I;16").save(
            root / "depth_images" / f"depth{i:06d}.png")
        p = np.eye(4); p[0, 3] = 0.1 * i
        poses.append(p.reshape(-1))
    with open(root / "traj.txt", "w") as f:
        for p in poses:
            f.write(" ".join(str(x) for x in p) + "\n")


def test_replica_loader(tmp_path):
    _write_replica_fixture(tmp_path)
    seq = ReplicaSequence(str(tmp_path))
    assert len(seq) == 3
    fr = seq.frame(1)
    assert fr.rgb.shape == (8, 10, 3)
    assert fr.depth.shape == (8, 10) and fr.depth.dtype == np.float32
    np.testing.assert_allclose(fr.gt_c2w[0, 3], 0.1)
    assert seq.gt_poses.shape == (3, 4, 4)


def _write_tum_fixture(root):
    from PIL import Image
    os.makedirs(root / "rgb"); os.makedirs(root / "depth")
    rng = np.random.default_rng(0)
    with open(root / "rgb.txt", "w") as fr_, open(root / "depth.txt", "w") as fd, \
            open(root / "groundtruth.txt", "w") as fp:
        fp.write("# ground truth trajectory\n")
        # frames every 1/60s; pose stream at slight offsets
        for i in range(12):
            t = 100.0 + i / 60.0
            Image.fromarray(rng.integers(0, 255, (6, 8, 3), dtype=np.uint8)
                            ).save(root / "rgb" / f"{t:.6f}.png")
            Image.fromarray(rng.integers(100, 5000, (6, 8)).astype(np.uint16),
                            mode="I;16").save(root / "depth" / f"{t:.6f}.png")
            fr_.write(f"{t:.6f} rgb/{t:.6f}.png\n")
            fd.write(f"{t + 0.004:.6f} depth/{t:.6f}.png\n")
            fp.write(f"{t + 0.002:.6f} {0.01 * i:.4f} 0 0 0 0 0 1\n")


def test_tum_loader_association_and_subsample(tmp_path):
    _write_tum_fixture(tmp_path)
    seq = TumSequence(str(tmp_path))
    # 60fps input, 1/32s keep threshold -> every other frame kept
    assert 5 <= len(seq) <= 7
    fr = seq.frame(0)
    assert fr.rgb.shape == (6, 8, 3)
    assert fr.depth.dtype == np.float32
    # poses strictly increasing in x
    xs = seq.poses[:, 0, 3]
    assert (np.diff(xs) > 0).all()


def test_open_dataset_factory():
    seq = open_dataset("synthetic", width=32, height=24, num_frames=2)
    assert len(seq) == 2
    with pytest.raises(ValueError):
        open_dataset("nope")


def test_ate_rmse_invariance():
    rng = np.random.default_rng(0)
    n = 50
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, :3, 3] = rng.normal(size=(n, 3))
    # a rigidly transformed copy has ATE 0
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    est = gt.copy()
    est[:, :3, 3] = gt[:, :3, 3] @ R.T + np.array([1.0, -2.0, 3.0])
    assert ate_rmse(gt, est) < 1e-9
    # known perturbation magnitude
    est2 = gt.copy()
    est2[:, :3, 3] += rng.normal(scale=0.01, size=(n, 3))
    err = ate_rmse(gt, est2)
    assert 0.003 < err < 0.03


def test_align_horn_recovers_transform():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(30, 3))
    ang = 0.3
    R_true = np.array([[1, 0, 0],
                       [0, np.cos(ang), -np.sin(ang)],
                       [0, np.sin(ang), np.cos(ang)]])
    t_true = np.array([0.5, -1.0, 2.0])
    data = pts @ R_true.T + t_true
    R, t, err = align_horn(pts, data)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)
    assert err.max() < 1e-10
