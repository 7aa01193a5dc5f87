"""Stress variants beyond the friendly synthetic box (VERDICT r1 item 3):
depth noise, rotation-heavy trajectory, and keyframe-store overflow.

The reference validates only on full Replica/TUM runs (replica.sh:97-104);
these synthetic stress runs cover the same failure axes — noisy depth
(TUM-like sensors), fast rotation (fr1_desk-like), and sequences with more
keyframes than the store holds — in seconds instead of minutes.
"""
import dataclasses

import jax
import numpy as np
import pytest

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.datasets import open_dataset
from gs_icp_slam_tpu.slam import FusedEngine


def _run(num_frames=12, noise_depth=0.0, angular_step=0.02,
         keyframe_capacity=16, keyframe_th=None, iters_final=60,
         motion_model=None, width=96, height=72, downsample=4):
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=num_frames, noise_depth=noise_depth,
                       angular_step=angular_step)
    cfg = synthetic_config(seq.intr, downsample_rate=downsample,
                           capacity=1 << 14,
                           target_capacity=1 << 12, visible_capacity=1 << 12)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2, mapping_iters_final=iters_final,
        keyframe_capacity=keyframe_capacity))
    if motion_model is not None:
        cfg = cfg.replace(gicp=dataclasses.replace(
            cfg.gicp, motion_model=motion_model))
    if keyframe_th is not None:
        cfg = cfg.replace(kf=dataclasses.replace(
            cfg.kf, keyframe_th=keyframe_th))
    eng = FusedEngine(seq, cfg)
    res = eng.run(eval_render=True, eval_stride=4)
    return eng, res


def test_depth_noise_tracking_survives():
    """1%% multiplicative depth noise: G-ICP tracking must stay metric
    (noise_depth existed since r1 but was never exercised)."""
    _, res = _run(noise_depth=0.01)
    assert res.ate_rmse is not None
    # noisy depth loosens the odometry floor but must not break it
    assert res.ate_rmse < 0.02, f"ATE {res.ate_rmse*100:.2f} cm under noise"
    assert res.psnr is not None and res.psnr > 18.0


def test_rotation_heavy_trajectory():
    """4x angular velocity: large inter-frame rotation stresses the
    constant-position motion model (mp_Tracker.py:197) — the DEFAULT
    (adaptive) model must pass without per-sequence tuning (VERDICT r3
    #6; it was previously green only with an opt-in CV seed).

    Also the regression pin for the r3 grid-kNN window bug: span=2 gave
    k=20 source-covariance neighbours only 25 candidates, degenerating
    the selection to fixed image-blocks and drifting this ATE
    3.4 -> 10.3 cm; the auto span (GICPConfig.grid_knn_span=0 -> 3)
    restores 3.3 cm, matching the exact O(S^2) search."""
    _, res = _run(angular_step=0.08)
    assert res.ate_rmse is not None
    # measured 3.3 cm with the CV seed (12 cm with the reference's
    # constant-position seed) at ~4.6 deg/frame on a 432-point cloud;
    # the adaptive model must pick the CV branch here.
    assert res.ate_rmse < 0.05, f"ATE {res.ate_rmse*100:.2f} cm fast-rot"


def test_sparse_smooth_tracking_stays_metric():
    """Sparse clouds (bench-like downsample) on a smooth orbit must stay
    mm-accurate over many frames under the DEFAULT (adaptive) model.
    Regression pin for the constant-velocity dead-band drift
    (GICPConfig.motion_model docstring): a pure CV seed accumulated
    0.22 m over 20 such frames by landing inside the GN convergence
    epsilon; the adaptive model's predicted-rotation magnitude gate
    (cfg.adaptive_trigger_deg) must keep the CP seed on these smooth
    frames so extrapolation error never enters the loop."""
    _, res = _run(num_frames=16, width=320, height=240, downsample=10,
                  iters_final=0)
    assert res.ate_rmse is not None
    assert res.ate_rmse < 0.005, f"ATE {res.ate_rmse*100:.2f} cm sparse"


def test_keyframe_store_overflow_evicts_not_drops():
    """More keyframes than slots: the reservoir must evict (kf_total >
    kf_stored), keep running, and keep mapping on a full store
    (the r1 silent-saturation cliff, engine.py:233-235)."""
    # keyframe on nearly every frame: tiny store + high threshold
    eng, res = _run(num_frames=14, keyframe_capacity=4, keyframe_th=0.999,
                    iters_final=40)
    assert res.kf_total > res.kf_stored, (res.kf_total, res.kf_stored)
    assert res.kf_stored == 4
    assert res.ate_rmse is not None and res.ate_rmse < 0.01
    assert res.psnr is not None and res.psnr > 15.0
    # the evicted store still maps: every stored slot is a real keyframe
    kf_rgb = np.asarray(jax.device_get(eng.state.kf_rgb))
    assert (kf_rgb.reshape(4, -1).std(axis=1) > 0).all()
