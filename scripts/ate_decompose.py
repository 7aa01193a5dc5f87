"""Decompose the bench's ~1.47 cm ATE plateau (VERDICT r4 weak #2).

Runs the exact bench configuration (synthetic 1200x680, ds 10, 36 frames)
and prints the PER-FRAME translation/rotation error of the estimated
trajectory against ground truth, both raw (frame 0 is anchored at gt, so
raw error IS accumulated drift) and Horn-aligned (the ATE protocol).
Sweepable knobs isolate candidate floors:

  --ds N            downsample rate (default 10; 5 = 4x the points)
  --gn-iters N      G-ICP max iterations (default config)
  --eps-scale S     scale BOTH convergence epsilons by S (0.1 = 10x tighter)
  --frames N        sequence length (default 36)
  --no-map          track frame-to-FIRST-FRAME-target only (freeze the
                    target after frame 0): isolates map-feedback error
  --cov-share 0/1   covariance sharing from optimized gaussians on/off
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ds", type=int, default=10)
    ap.add_argument("--gn-iters", type=int, default=0)
    ap.add_argument("--eps-scale", type=float, default=1.0)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--iters", type=int, default=2,
                    help="mapping iters/frame (0 = no mapping updates)")
    ap.add_argument("--degen", type=float, default=-1.0,
                    help="degeneracy_thresh override (-1 = config)")
    ap.add_argument("--step", type=float, default=0.02,
                    help="trajectory angular_step")
    ap.add_argument("--capacity", type=int, default=18,
                    help="log2 map capacity")
    ap.add_argument("--quiet", action="store_true",
                    help="only print the summary line")
    args = ap.parse_args()

    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.eval.ate import ate_rmse
    from gs_icp_slam_tpu.slam import FusedEngine

    width, height = 1200, 680
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=args.frames, angular_step=args.step)
    cfg = synthetic_config(seq.intr, downsample_rate=args.ds,
                           capacity=1 << args.capacity,
                           target_capacity=1 << 16,
                           visible_capacity=1 << 16)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=args.iters,
        keyframe_capacity=64))
    gk = {}
    if args.gn_iters:
        gk["max_iterations"] = args.gn_iters
    if args.eps_scale != 1.0:
        gk["rotation_epsilon"] = cfg.gicp.rotation_epsilon * args.eps_scale
        gk["transformation_epsilon"] = (cfg.gicp.transformation_epsilon
                                        * args.eps_scale)
    if args.degen >= 0.0:
        gk["degeneracy_thresh"] = args.degen
    if gk:
        cfg = cfg.replace(gicp=dataclasses.replace(cfg.gicp, **gk))

    eng = FusedEngine(seq, cfg)
    res = eng.run(eval_render=False)

    gt = np.stack([np.asarray(seq[i].gt_c2w, np.float64)
                   for i in range(args.frames)])
    est = res.poses

    # raw per-frame errors (frame 0 anchored at gt => accumulated drift)
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    rerr = []
    for i in range(args.frames):
        R = est[i, :3, :3] @ gt[i, :3, :3].T
        c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
        rerr.append(np.degrees(np.arccos(c)))
    rerr = np.asarray(rerr)

    if not args.quiet:
        print(f"{'frame':>5} {'t_err_cm':>9} {'r_err_deg':>9}")
        for i in range(args.frames):
            print(f"{i:5d} {terr[i] * 100:9.3f} {rerr[i]:9.4f}")
    drift_cm_per_frame = np.polyfit(np.arange(args.frames),
                                    terr, 1)[0] * 100
    print(f"SUMMARY ds={args.ds} iters={args.iters} "
          f"gn={args.gn_iters or 'cfg'} eps_scale={args.eps_scale} "
          f"degen={cfg.gicp.degeneracy_thresh}: "
          f"ate={float(ate_rmse(gt, est)) * 100:.3f}cm "
          f"t_err_final={terr[-1] * 100:.3f}cm "
          f"t_err_max={terr.max() * 100:.3f}cm "
          f"drift_fit={drift_cm_per_frame:.4f}cm/frame "
          f"r_err_final={rerr[-1]:.4f}deg fps={res.fps:.1f} "
          f"kf_total={res.kf_total} nlive={res.num_gaussians} "
          f"visdrop={res.vis_cap_dropped} paildrop={res.tile_cap_dropped}")


if __name__ == "__main__":
    main()
