"""Capacity-bucket dispatch: the fused step compiled at a small static
bucket must produce the same SLAM quality as the full-capacity step —
buckets change compile-time shapes, never results (beyond fp ordering).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.datasets import open_dataset
from gs_icp_slam_tpu.slam import FusedEngine


def test_bucketed_run_matches_quality():
    """Engine-picked buckets (smaller than capacity) hit the same
    thresholds as test_fused.py's full-capacity run."""
    seq = open_dataset("synthetic", width=128, height=96, num_frames=12)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 16,
                           target_capacity=1 << 13,
                           visible_capacity=1 << 12)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=3, mapping_iters_final=100,
        keyframe_capacity=16))
    eng = FusedEngine(seq, cfg)
    nb, tb = eng._pick_buckets(0)
    assert nb is not None and nb < cfg.map.capacity  # buckets engage
    assert tb is not None and tb < cfg.engine.target_capacity
    res = eng.run(eval_render=True, eval_stride=4)
    assert res.ate_rmse is not None and res.ate_rmse < 0.005, res.ate_rmse
    assert res.psnr is not None and res.psnr > 25.0, res.psnr
    # silent pair-dropping must never masquerade as quality/perf again
    # (round-2 regression: capacity-keyed K clamp dropped 1313 pairs here)
    assert res.tile_cap_dropped == 0, res.tile_cap_dropped
    assert res.vis_cap_dropped == 0, res.vis_cap_dropped


def test_bucket_slicing_preserves_out_of_bucket_slots():
    """Splats beyond the bucket stay untouched by mapping iterations."""
    from gs_icp_slam_tpu.slam.fused import make_fused_step
    from gs_icp_slam_tpu.slam.state import init_state
    from gs_icp_slam_tpu.utils.pointcloud import make_downsample_filter

    seq = open_dataset("synthetic", width=64, height=48, num_frames=4)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 15,
                           target_capacity=1 << 13,
                           visible_capacity=1 << 11)
    eng = FusedEngine(seq, cfg)
    state = eng.fused.pin_state(
        init_state(cfg, 4, np.asarray(seq[0].gt_c2w, np.float32)))
    from gs_icp_slam_tpu.slam.fused import to_chw

    # run two frames at a small bucket
    nb, tb2 = 1 << 14, 4096
    for i in range(2):
        fr = seq[i]
        state = eng.fused.step(state, jnp.asarray(fr.depth), to_chw(fr.rgb),
                               jnp.bool_(False), nb, tb2)
    # everything beyond the bucket is still exactly the init value (zeros)
    tail = np.asarray(jax.device_get(state.gmap.xyz[nb:]))
    assert (tail == 0).all()
    assert not np.asarray(jax.device_get(state.gmap.live[nb:])).any()
    n = int(jax.device_get(state.gmap.n))
    assert 0 < n < nb
