"""The SLAM engine: single-process fusion of the reference's tracker and
mapper processes.

The reference runs tracking (mp_Tracker.py) and mapping (mp_Mapper.py) as
two OS processes spin-waiting on shared-memory flags (gs_icp_slam.py:81-131).
Here the whole state — gaussian map + Adam moments, G-ICP target, keyframe
store, pose history — lives in device memory, per-frame work is a handful
of jitted functions, and the keyframe protocol becomes plain control flow:

  per frame:
    downsample/unproject ........ jit  (mp_Tracker.py:415-431)
    source covariances + G-ICP .. jit  (mp_Tracker.py:191-199)
    keyframe decision ........... host scalars (mp_Tracker.py:235-249)
    insert gaussians ............ jit  (gaussian_model.py:134,165)
    trackable export → target ... jit  (covariance sharing,
                                        mp_Tracker.py:286-288)
    K x map optimization steps .. jit  (mp_Mapper.py:196-248)

The mapper's "as fast as possible" free-running loop becomes a fixed
`mapping_iters_per_frame` budget per frame (the reference implicitly gets
~a few iterations per frame at 30 FPS on its hardware).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from ..datasets.base import RGBDSequence
from ..eval.ate import ate_rmse
from ..models import (AdamState, GaussianMap, adam_init, add_gaussians,
                      adam_step, compact, empty_map, map_lr_tree, map_params,
                      prune_large_and_transparent, trackable_export,
                      with_params)
from ..ops.gicp import (GICPTarget, gicp_align, make_source,
                        source_correspondences, target_from_gaussians,
                        target_from_points)
from ..ops.rasterize import rasterize_tiled
from ..utils.losses import mapping_loss, psnr
from ..utils.pointcloud import downsample_pointcloud, make_downsample_filter
from ..utils.quat import quat_multiply, rotmat_to_quat
from ..utils.se3 import invert_se3, transform_points


@dataclass
class SLAMResult:
    poses: np.ndarray            # (N, 4, 4) estimated c2w
    gt_poses: Optional[np.ndarray]
    ate_rmse: Optional[float]    # meters
    fps: float
    num_gaussians: int
    psnr: Optional[float] = None
    per_frame_psnr: Optional[np.ndarray] = None
    # static-cap overflow observability (VERDICT r1 #4): zero = no quality
    # was silently dropped by a cap during the run
    kf_total: int = 0            # keyframes ever selected
    kf_stored: int = 0           # keyframe slots in use (< total => evicted)
    vis_cap_dropped: int = 0     # max per-view visible-cap overflow
    tile_cap_dropped: int = 0    # max per-view tile-list overflow (pairs)


class SLAMEngine:
    def __init__(self, dataset: RGBDSequence, cfg: SLAMConfig,
                 seed: int = 0):
        self.dataset = dataset
        self.cfg = cfg
        intr = cfg.intr
        self.filt = make_downsample_filter(
            intr.width, intr.height, intr.fx, intr.fy, intr.cx, intr.cy,
            cfg.downsample_rate)
        self.rng = np.random.default_rng(seed)

        # --- persistent device state ---
        self.gmap: GaussianMap = empty_map(cfg.map.capacity,
                                           cfg.map.sh_degree)
        self.adam: AdamState = adam_init(map_params(self.gmap))
        self.lrs = map_lr_tree(cfg.opt)
        self.target: Optional[GICPTarget] = None

        kf_cap = max(8, cfg.engine.keyframe_capacity)
        self.kf_w2c = np.zeros((kf_cap, 4, 4), np.float32)
        self.kf_rgb = np.zeros((kf_cap, 3, intr.height, intr.width), np.uint8)
        self.kf_depth = np.zeros((kf_cap, intr.height, intr.width),
                                 np.float32)
        self.kf_count = 0
        self.kf_total = 0
        self.new_keyframes: List[int] = []

        self.poses: List[np.ndarray] = []
        self.from_last_kf = 0
        self.train_iter = 0
        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        cfg = self.cfg
        intr = cfg.intr
        gicp_cfg = cfg.gicp
        flat_idxs = jnp.asarray(self.filt.flat_idxs)
        x_pre = jnp.asarray(self.filt.x_pre)
        y_pre = jnp.asarray(self.filt.y_pre)

        @jax.jit
        def preprocess(depth, rgb):
            # rgb is channel-first (3, H, W) uint8 (see fused.to_chw)
            z = depth.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
            colors = (rgb.reshape(3, -1)[:, flat_idxs].T
                      .astype(jnp.float32) / 255.0)
            x = x_pre * z
            y = y_pre * z
            points = jnp.stack([x, y, z], axis=-1)
            valid = z != 0.0
            trackable = valid & (z <= intr.depth_trunc)
            return points, colors, z, valid, trackable

        self._preprocess = preprocess

        @jax.jit
        def build_source(points, valid, trackable):
            return make_source(points, valid, gicp_cfg, trackable=trackable)

        self._build_source = build_source

        @jax.jit
        def first_target(points_world, trackable):
            return target_from_points(points_world, trackable, gicp_cfg,
                                      capacity=cfg.engine.target_capacity)

        self._first_target = first_target

        def align(source, target, init_pose, init_T2=None):
            return gicp_align(source, target, init_pose, gicp_cfg,
                              init_T2=init_T2)

        self._align = align

        @jax.jit
        def frame_post(T, source, target):
            """World points, world-rotated covariance quats, overlap stats."""
            pts_w = transform_points(T, source.points)
            idx, sqd = source_correspondences(T, source.points, target)
            n_track = jnp.sum(source.valid)
            overlap = jnp.sum(source.valid & (sqd < cfg.kf.overlapped_th))
            ratio = overlap / jnp.maximum(n_track, 1)
            pose_q = rotmat_to_quat(T[:3, :3])
            rots_w = quat_multiply(pose_q[None, :], source.quat)
            return pts_w, rots_w, sqd, ratio

        self._frame_post = frame_post

        @jax.jit
        def insert(gmap, pts_w, colors, rots_w, scales, z, trackable, valid):
            return add_gaussians(gmap, pts_w, colors, rots_w, scales, z,
                                 trackable, valid,
                                 init_opacity=cfg.map.init_opacity)

        self._insert = insert

        out_cap = cfg.engine.target_capacity

        @jax.jit
        def export_target(gmap):
            pts, rots, scales, valid = trackable_export(
                gmap, cfg.map.trackable_opacity_th, out_cap)
            return target_from_gaussians(pts, rots, scales, valid, gicp_cfg,
                                         capacity=out_cap)

        self._export_target = export_target

        # mapping primitives are SHARED with the fused engine (VERDICT r2
        # #9: this file used to re-implement opt_step/raster and drifted —
        # it missed the r2 bucketing and tile-cap work entirely).  One
        # code path: fused.make_mapping_primitives.
        from .fused import make_mapping_primitives
        prim = make_mapping_primitives(cfg, None)
        bg = jnp.asarray(cfg.render.bg_color, jnp.float32)
        raster = prim.raster
        fx, fy = intr.fx, intr.fy
        # rendering uses GL-convention principal point for reference parity
        # (SURVEY §2.15: the GL projection has no cx/cy offset)
        rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0
        _params_sh = prim.sh_concat

        self._opt_step = jax.jit(prim.opt_step)

        @jax.jit
        def prune(gmap):
            return prune_large_and_transparent(
                gmap, cfg.map.prune_min_opacity, cfg.map.prune_extent)

        self._prune = prune

        @jax.jit
        def render_eval(params, live, w2c, rgb_u8, depth_raw):
            gt_img = rgb_u8.astype(jnp.float32) / 255.0  # (3, H, W) input
            gt_depth = depth_raw / intr.depth_scale
            out = raster(params["xyz"], params["rotation"],
                         jnp.exp(params["log_scaling"]),
                         jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                         _params_sh(params), w2c, live, bg, fx, fy, rcx, rcy)
            mask = (gt_depth > 0.0)[None]
            mse = jnp.sum(((out.color - gt_img) * mask) ** 2) / jnp.maximum(
                jnp.sum(mask) * 3.0, 1.0)
            return out.color, -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

        self._render_eval = render_eval

    # ------------------------------------------------------------------
    def _store_keyframe(self, frame, w2c: np.ndarray):
        # reservoir eviction once full (see fused.store_keyframe): keeps the
        # stored set a uniform sample of all keyframes ever selected
        kc = self.kf_w2c.shape[0]
        if self.kf_count >= kc:
            i = int(self.rng.integers(kc))
            if i in self.new_keyframes:
                self.new_keyframes.remove(i)
        else:
            i = self.kf_count
            self.kf_count += 1
        self.kf_w2c[i] = w2c
        self.kf_rgb[i] = frame.rgb.transpose(2, 0, 1)
        self.kf_depth[i] = frame.depth
        self.kf_total += 1
        self.new_keyframes.append(i)

    def _mapping_iterations(self, n_iters: int):
        params = map_params(self.gmap)
        for _ in range(n_iters):
            if self.kf_count == 0:
                return
            if self.new_keyframes:
                i = self.new_keyframes.pop(0)
            else:
                i = int(self.rng.integers(self.kf_count))
            self.train_iter += 1
            if self.train_iter % self.cfg.map.prune_interval == 0:
                self.gmap = with_params(self.gmap, params)
                self.gmap = self._prune(self.gmap)
            params, self.adam, _, stats = self._opt_step(
                params, self.adam, self.gmap.live,
                jnp.asarray(self.kf_w2c[i]), jnp.asarray(self.kf_rgb[i]),
                jnp.asarray(self.kf_depth[i]))
            self._last_stats = stats
        # cap-overflow observability (device sync amortized: once per
        # mapping batch, not per iteration)
        last = getattr(self, "_last_stats", None)
        s = (np.asarray(jax.device_get(last)) if last is not None
             else np.zeros(3, np.int32))
        self._vis_dropped = max(getattr(self, "_vis_dropped", 0), int(s[1]))
        self._pair_dropped = max(getattr(self, "_pair_dropped", 0),
                                 int(s[2]))
        self.gmap = with_params(self.gmap, params)

    # ------------------------------------------------------------------
    def step(self, idx: int, frame) -> None:
        cfg = self.cfg
        from .fused import to_chw
        depth = jnp.asarray(frame.depth)
        rgb = to_chw(frame.rgb)
        points, colors, z, valid, trackable = self._preprocess(depth, rgb)

        if idx == 0:
            pose0 = np.asarray(
                frame.gt_c2w if frame.gt_c2w is not None else np.eye(4),
                np.float32)
            self.poses.append(pose0)
            pts_w = transform_points(jnp.asarray(pose0), points)
            target, quat, scales = self._first_target(pts_w, trackable)
            self.target = target
            self.gmap = self._insert(self.gmap, pts_w, colors, quat, scales,
                                     z, trackable, valid)
            self._store_keyframe(frame, np.asarray(invert_se3(
                jnp.asarray(pose0))))
            self.from_last_kf = 0
            self._mapping_iterations(cfg.engine.mapping_iters_per_frame)
            return

        source = self._build_source(points, valid, trackable)
        prev = np.asarray(self.poses[-1], np.float64)
        model = self.cfg.gicp.motion_model
        init_np, init2_np = prev, None
        if (model in ("constant_velocity", "adaptive")
                and len(self.poses) >= 2):
            # extrapolate the last relative motion (see GICPConfig; the
            # reference seeds with the previous pose, mp_Tracker.py:197)
            prev2 = np.asarray(self.poses[-2], np.float64)
            cv = prev @ np.linalg.inv(prev2) @ prev
            if model == "adaptive":
                init2_np = cv  # CP seed + CV proposal (gicp_align picks)
            else:
                init_np = cv
        init_T = jnp.asarray(init_np, jnp.float32)
        init_T2 = (None if init2_np is None
                   else jnp.asarray(init2_np, jnp.float32))
        T, _, _, _ = self._align(source, self.target, init_T,
                                 init_T2=init_T2)
        pts_w, rots_w, sqd, ratio = self._frame_post(T, source, self.target)
        T_np = np.asarray(T, np.float64)
        self.poses.append(T_np)

        last = idx >= len(self.dataset) - 1
        if last or float(ratio) < cfg.kf.keyframe_th:
            tracking_kf, self.from_last_kf = True, 0
        else:
            tracking_kf = False
            self.from_last_kf += 1
        mapping_kf = (not tracking_kf
                      and self.from_last_kf % cfg.kf.keyframe_freq == 0)

        if tracking_kf or mapping_kf:
            if tracking_kf:
                # overlap dedup applies to the trackable mask only — ALL
                # points still become gaussians (mp_Tracker.py:266-275)
                new_trackable = trackable & (sqd > cfg.kf.overlapped_th2)
            else:
                new_trackable = trackable
            self.gmap = self._insert(self.gmap, pts_w, colors, rots_w,
                                     source.scales, z, new_trackable, valid)
            w2c = np.asarray(invert_se3(T), np.float32)
            self._store_keyframe(frame, w2c)
            if tracking_kf:
                # covariance sharing, map -> tracker (mp_Tracker.py:286-288)
                self.target = self._export_target(self.gmap)

        self._mapping_iterations(cfg.engine.mapping_iters_per_frame)

    # ------------------------------------------------------------------
    def run(self, eval_render: bool = True, eval_stride: int = 1,
            progress: bool = False) -> SLAMResult:
        n = len(self.dataset)
        t0 = time.time()
        for i in range(n):
            self.step(i, self.dataset[i])
            if progress and i % 50 == 0:
                print(f"frame {i}/{n}  gaussians={int(self.gmap.num_live)}")
        # make sure all device work is done before timing
        jax.block_until_ready(self.gmap.xyz)
        elapsed = time.time() - t0
        fps = n / elapsed

        final_iters = self.cfg.engine.mapping_iters_final
        if final_iters:
            self._mapping_iterations(final_iters)

        poses = np.stack(self.poses)
        gt = None
        ate = None
        try:
            gt = self.dataset.gt_poses
            ate = ate_rmse(gt, poses)
        except Exception:
            pass

        psnr_mean = None
        per_frame = None
        if eval_render:
            params = map_params(self.gmap)
            vals = []
            for i in range(0, n, eval_stride):
                fr = self.dataset[i]
                w2c = np.asarray(invert_se3(jnp.asarray(poses[i],
                                                        jnp.float32)))
                from .fused import to_chw
                _, p = self._render_eval(params, self.gmap.live,
                                         jnp.asarray(w2c),
                                         to_chw(fr.rgb),
                                         jnp.asarray(fr.depth))
                vals.append(float(p))
            per_frame = np.asarray(vals)
            psnr_mean = float(per_frame.mean())

        return SLAMResult(poses=poses, gt_poses=gt, ate_rmse=ate, fps=fps,
                          num_gaussians=int(self.gmap.num_live),
                          psnr=psnr_mean, per_frame_psnr=per_frame,
                          kf_total=self.kf_total, kf_stored=self.kf_count,
                          vis_cap_dropped=getattr(self, "_vis_dropped", 0),
                          tile_cap_dropped=getattr(self, "_pair_dropped", 0))
