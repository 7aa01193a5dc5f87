"""End-to-end SLAM engine test: the explicit version of the reference's
only implicit test (full-run metric checks, SURVEY §4) on a cropped
synthetic sequence."""
import dataclasses

import numpy as np
import pytest

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.datasets import open_dataset
from gs_icp_slam_tpu.slam import SLAMEngine


@pytest.fixture(scope="module")
def slam_result():
    seq = open_dataset("synthetic", width=128, height=96, num_frames=12)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 14,
                           target_capacity=1 << 12, visible_capacity=1 << 12)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=3, mapping_iters_final=100))
    eng = SLAMEngine(seq, cfg)
    res = eng.run(eval_render=True, eval_stride=4)
    return eng, res


def test_tracking_accuracy(slam_result):
    _, res = slam_result
    assert res.ate_rmse is not None
    assert res.ate_rmse < 0.005, f"ATE {res.ate_rmse*100:.2f} cm"


def test_mapping_quality(slam_result):
    _, res = slam_result
    assert res.psnr is not None
    assert res.psnr > 25.0, f"PSNR {res.psnr:.2f} dB"


def test_keyframe_sparsity(slam_result):
    """Keyframing must actually sparsify: not every frame inserted."""
    eng, res = slam_result
    assert eng.kf_count < len(res.poses)
    assert eng.kf_count >= 1
    assert res.num_gaussians <= eng.kf_count * eng.filt.num_points


def test_poses_shape_and_start(slam_result):
    eng, res = slam_result
    assert res.poses.shape == (12, 4, 4)
    np.testing.assert_allclose(res.poses[0], res.gt_poses[0], atol=1e-6)
