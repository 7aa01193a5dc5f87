"""Fused single-dispatch SLAM step: the whole frame (track + keyframe +
map-opt) as ONE jitted program must match the staged engine's quality on
the synthetic sequence (same thresholds as test_slam_engine.py)."""
import dataclasses

import numpy as np
import pytest

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.datasets import open_dataset
from gs_icp_slam_tpu.slam import FusedEngine


@pytest.fixture(scope="module")
def fused_result():
    seq = open_dataset("synthetic", width=128, height=96, num_frames=12)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 14,
                           target_capacity=1 << 12, visible_capacity=1 << 12)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=3, mapping_iters_final=100,
        keyframe_capacity=16))
    eng = FusedEngine(seq, cfg)
    res = eng.run(eval_render=True, eval_stride=4)
    return eng, res


def test_fused_tracking_accuracy(fused_result):
    _, res = fused_result
    assert res.ate_rmse is not None
    assert res.ate_rmse < 0.005, f"ATE {res.ate_rmse*100:.2f} cm"


def test_fused_mapping_quality(fused_result):
    _, res = fused_result
    assert res.psnr is not None
    assert res.psnr > 25.0, f"PSNR {res.psnr:.2f} dB"
    # caps must not silently drop quality (VERDICT r2 #2)
    assert res.tile_cap_dropped == 0, res.tile_cap_dropped
    assert res.vis_cap_dropped == 0, res.vis_cap_dropped


def test_fused_keyframe_sparsity(fused_result):
    eng, res = fused_result
    import jax
    kf_count = int(jax.device_get(eng.state.kf_count))
    assert 1 <= kf_count < len(res.poses)
    assert res.num_gaussians <= kf_count * eng.filt.num_points


def test_fused_poses_start_at_gt(fused_result):
    _, res = fused_result
    assert res.poses.shape == (12, 4, 4)
    np.testing.assert_allclose(res.poses[0], res.gt_poses[0], atol=1e-6)
