"""The fused per-frame SLAM step: tracking + keyframing + mapping as ONE
XLA program.

The reference interleaves its tracker and mapper through shared-memory
flags and busy waits (SURVEY §2.4); a naive port — one jit call per stage
plus host-side keyframe logic — costs 6-10 host round trips per frame,
which on a remote-dispatched TPU (~30 ms/round trip) dwarfs the actual
compute.  Fusing the whole frame into one jitted function makes the frame
rate limited by compute only: the host just streams frames in, and
successive dispatches pipeline.

Keyframe decisions (mp_Tracker.py:235-249) become lax.cond branches;
gaussian insertion masks its own validity by the keyframe flag, so the
non-keyframe path writes nothing; the mapper's per-frame iteration budget
is a Python-unrolled loop of optimization steps with jax.random keyframe
choice (newest-first, then uniform — mp_Mapper.py:200-206).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..models import (add_gaussians, adam_step, map_lr_tree, map_params,
                      prune_large_and_transparent, trackable_export,
                      with_params)
from ..ops.gicp import (gicp_align, make_source, source_correspondences,
                        target_from_gaussians, target_from_points, GICPTarget)
from ..ops.rasterize import rasterize_tiled
from ..utils.losses import mapping_loss
from ..utils.pointcloud import DownsampleFilter
from ..utils.quat import quat_multiply, rotmat_to_quat
from ..utils.se3 import invert_se3, transform_points


class FusedStep(NamedTuple):
    step: Callable        # (state, depth, rgb_chw, is_last) -> state
    render_eval: Callable  # (params, live, w2c, rgb_chw, depth) -> (img, psnr)
    refine: Callable      # (state,) -> state: REFINE_CHUNK mapping iters


REFINE_CHUNK = 16  # post-run refinement iterations per jit call


def to_chw(rgb_hwc) -> "jnp.ndarray":
    """Host-side (H, W, 3) uint8 -> device channel-first (3, H, W).

    All jit boundaries take channel-first images: a trailing dim of 3
    would be padded to the 128-lane TPU tile, inflating HBM 42x."""
    import numpy as np
    return jnp.asarray(np.ascontiguousarray(
        np.asarray(rgb_hwc).transpose(2, 0, 1)))


def make_fused_step(cfg: SLAMConfig, filt: DownsampleFilter) -> FusedStep:
    intr = cfg.intr
    gicp_cfg = cfg.gicp
    rcfg = cfg.render
    lrs = map_lr_tree(cfg.opt)
    tc = cfg.engine.target_capacity

    flat_idxs = jnp.asarray(filt.flat_idxs)
    x_pre = jnp.asarray(filt.x_pre)
    y_pre = jnp.asarray(filt.y_pre)

    bg = jnp.asarray(rcfg.bg_color, jnp.float32)
    fx, fy = intr.fx, intr.fy
    rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0
    raster = partial(
        rasterize_tiled, sh_degree=cfg.map.sh_degree, width=intr.width,
        height=intr.height, tile=rcfg.tile_size,
        visible_cap=rcfg.visible_capacity, tile_span=rcfg.tile_span,
        tile_cap=rcfg.max_per_tile, chunk=rcfg.composite_chunk, want_used=False)

    def _sh(params):
        return jnp.concatenate(
            [params["f_dc"][:, None, :], params["f_rest"]], axis=1)

    # ---------------- mapping ----------------
    def opt_step(params, adam, live, w2c, rgb_u8, depth_raw):
        # rgb_u8 is channel-first (3, H, W): see SLAMState.kf_rgb
        gt_img = rgb_u8.astype(jnp.float32) / 255.0
        gt_depth = depth_raw / intr.depth_scale

        def loss_fn(p):
            out = raster(p["xyz"], p["rotation"], jnp.exp(p["log_scaling"]),
                         jax.nn.sigmoid(p["opacity_logit"][:, 0]), _sh(p),
                         w2c, live, bg, fx, fy, rcx, rcy)
            loss, _ = mapping_loss(out.color, out.depth, gt_img, gt_depth,
                                   lambda_dssim=cfg.opt.lambda_dssim,
                                   depth_weight=cfg.opt.depth_loss_weight,
                                   d_max=cfg.opt.depth_d_max)
            return loss, out.stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        params, adam = adam_step(params, grads, adam, lrs, live,
                                 b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                                 eps=cfg.opt.adam_eps)
        return params, adam, loss, stats

    def mapping_iters(state, n_iters: int):
        gmap, adam = state.gmap, state.adam
        params = map_params(gmap)
        rng = state.rng
        new_kf = state.new_kf
        train_iter = state.train_iter
        vis_drop, pair_drop = state.stat_vis_dropped, state.stat_pair_dropped
        for it in range(n_iters):
            rng, sub = jax.random.split(rng)
            rand_idx = jax.random.randint(sub, (), 0,
                                          jnp.maximum(state.kf_count, 1))
            idx = jnp.where((it == 0) & (new_kf >= 0), new_kf, rand_idx)
            train_iter = train_iter + 1

            def do_prune(m):
                return prune_large_and_transparent(
                    m, cfg.map.prune_min_opacity, cfg.map.prune_extent)

            gmap = jax.lax.cond(
                train_iter % cfg.map.prune_interval == 0, do_prune,
                lambda m: m, with_params(gmap, params))
            params = map_params(gmap)

            w2c = state.kf_w2c[idx]
            rgb = state.kf_rgb[idx]
            depth = state.kf_depth[idx]
            # frame 0 has no stored keyframe yet: skip the whole render +
            # backward instead of computing and discarding it
            params, adam, _, stats = jax.lax.cond(
                state.kf_count > 0,
                lambda p, a: opt_step(p, a, gmap.live, w2c, rgb, depth),
                lambda p, a: (p, a, jnp.float32(0),
                              jnp.zeros((3,), jnp.int32)),
                params, adam)
            vis_drop = jnp.maximum(vis_drop, stats[1])
            pair_drop = jnp.maximum(pair_drop, stats[2])
        gmap = with_params(gmap, params)
        return state._replace(gmap=gmap, adam=adam, rng=rng,
                              new_kf=jnp.int32(-1), train_iter=train_iter,
                              stat_vis_dropped=vis_drop,
                              stat_pair_dropped=pair_drop)

    # ---------------- keyframe insertion ----------------
    def store_keyframe(state, w2c, rgb_u8, depth_raw, do_store):
        """Store a keyframe; once the store is full, EVICT a uniformly
        random old slot (reservoir-style).  The reference keeps every
        keyframe and the mapper samples uniformly from them
        (mp_Mapper.py:174-206); a uniform-eviction reservoir keeps the
        stored set an (approximately) uniform sample of the full history,
        so the mapper's sampling distribution matches at bounded memory.
        kf_total > kf_count signals that eviction has happened."""
        kc = state.kf_w2c.shape[0]
        rng, sub = jax.random.split(state.rng)
        victim = jax.random.randint(sub, (), 0, kc)
        slot_in = jnp.where(state.kf_count < kc, state.kf_count, victim)
        slot = jnp.where(do_store, slot_in, kc)
        kf_w2c = state.kf_w2c.at[slot].set(w2c, mode="drop")
        kf_rgb = state.kf_rgb.at[slot].set(rgb_u8, mode="drop")
        kf_depth = state.kf_depth.at[slot].set(depth_raw, mode="drop")
        stored = do_store.astype(jnp.int32)
        return state._replace(
            kf_w2c=kf_w2c, kf_rgb=kf_rgb, kf_depth=kf_depth, rng=rng,
            kf_count=jnp.minimum(state.kf_count + stored, kc),
            kf_total=state.kf_total + stored,
            new_kf=jnp.where(do_store, slot_in, state.new_kf))

    def export_target(gmap):
        pts, rots, scales, valid = trackable_export(
            gmap, cfg.map.trackable_opacity_th, tc)
        return target_from_gaussians(pts, rots, scales, valid, gicp_cfg,
                                     capacity=tc)

    # ---------------- the fused frame step ----------------
    def step(state, depth_raw, rgb_u8, is_last):
        # preprocess (mp_Tracker.py:415-431); rgb_u8 is (3, H, W)
        z = depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
        colors = (rgb_u8.reshape(3, -1)[:, flat_idxs].T
                  .astype(jnp.float32) / 255.0)
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        trackable = valid & (z <= intr.depth_trunc)

        def first_frame(state):
            pose0 = state.poses[0]
            pts_w = transform_points(pose0, points)
            target, quat, scales = target_from_points(pts_w, trackable,
                                                      gicp_cfg, capacity=tc)
            gmap = add_gaussians(state.gmap, pts_w, colors, quat, scales, z,
                                 trackable, valid,
                                 init_opacity=cfg.map.init_opacity)
            state = state._replace(gmap=gmap, target=target,
                                   last_ratio=jnp.float32(0.0))
            state = store_keyframe(state, invert_se3(pose0), rgb_u8,
                                   depth_raw, jnp.bool_(True))
            return state._replace(
                poses=state.poses.at[0].set(pose0),
                frame_idx=jnp.int32(1), from_last_kf=jnp.int32(0))

        def track_frame(state):
            source = make_source(points, valid, gicp_cfg,
                                 trackable=trackable)
            init_T = state.poses[state.frame_idx - 1]
            T, _ = gicp_align(source, state.target, init_T, gicp_cfg)

            pts_w = transform_points(T, source.points)
            _, sqd = source_correspondences(T, source.points, state.target)
            n_track = jnp.sum(source.valid)
            overlap = jnp.sum(source.valid
                              & (sqd < cfg.kf.overlapped_th))
            ratio = overlap / jnp.maximum(n_track, 1)
            pose_q = rotmat_to_quat(T[:3, :3])
            rots_w = quat_multiply(pose_q[None, :], source.quat)

            tracking_kf = is_last | (ratio < cfg.kf.keyframe_th)
            from_last = jnp.where(tracking_kf, 0, state.from_last_kf + 1)
            mapping_kf = (~tracking_kf) & (from_last % cfg.kf.keyframe_freq
                                           == 0)
            do_insert = tracking_kf | mapping_kf

            # overlap dedup restricts the trackable mask on tracking KFs
            # (mp_Tracker.py:266-275); all valid points still insert
            new_trackable = jnp.where(tracking_kf,
                                      trackable & (sqd > cfg.kf.overlapped_th2),
                                      trackable)
            gmap = add_gaussians(state.gmap, pts_w, colors, rots_w,
                                 source.scales, z, new_trackable,
                                 valid & do_insert,
                                 init_opacity=cfg.map.init_opacity)
            state = state._replace(gmap=gmap, last_ratio=ratio)
            state = store_keyframe(state, invert_se3(T), rgb_u8, depth_raw,
                                   do_insert)

            # covariance sharing, map -> tracker, on tracking keyframes
            # (mp_Tracker.py:286-288); heavy, so guarded by cond
            target = jax.lax.cond(tracking_kf,
                                  lambda m: export_target(m),
                                  lambda m: state.target, state.gmap)

            return state._replace(
                target=target,
                poses=state.poses.at[state.frame_idx].set(T),
                frame_idx=state.frame_idx + 1,
                from_last_kf=from_last)

        state = jax.lax.cond(state.frame_idx == 0, first_frame, track_frame,
                             state)
        state = mapping_iters(state, cfg.engine.mapping_iters_per_frame)
        return state

    step = jax.jit(step, donate_argnums=(0,))

    # post-run map refinement (the reference mapper free-runs after the
    # tracker ends, mp_Mapper.py:154); chunked so the host can size the
    # total budget without recompiling
    refine = jax.jit(lambda state: mapping_iters(state, REFINE_CHUNK),
                     donate_argnums=(0,))

    @jax.jit
    def render_eval(params, live, w2c, rgb_u8, depth_raw):
        gt_img = rgb_u8.astype(jnp.float32) / 255.0  # (3, H, W) input
        gt_depth = depth_raw / intr.depth_scale
        out = raster(params["xyz"], params["rotation"],
                     jnp.exp(params["log_scaling"]),
                     jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                     _sh(params), w2c, live, bg, fx, fy, rcx, rcy)
        mask = (gt_depth > 0.0)[None]
        mse = jnp.sum(((out.color - gt_img) * mask) ** 2) / jnp.maximum(
            jnp.sum(mask) * 3.0, 1.0)
        return out.color, -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    return FusedStep(step=step, render_eval=render_eval, refine=refine)


class FusedEngine:
    """Drop-in alternative to SLAMEngine that runs the whole frame as ONE
    jitted dispatch (see module docstring): the host loop only feeds frames
    and rebinds the donated state, so successive frames pipeline on device
    and per-dispatch host latency amortizes away."""

    def __init__(self, dataset: "RGBDSequence", cfg: SLAMConfig,
                 seed: int = 0):
        from ..utils.pointcloud import make_downsample_filter

        self.dataset = dataset
        self.cfg = cfg
        intr = cfg.intr
        self.filt = make_downsample_filter(
            intr.width, intr.height, intr.fx, intr.fy, intr.cx, intr.cy,
            cfg.downsample_rate)
        self.seed = seed
        self.fused = make_fused_step(cfg, self.filt)
        self.state = None

    def _finalize(self, iters: int):
        for _ in range(-(-iters // REFINE_CHUNK) if iters > 0 else 0):
            self.state = self.fused.refine(self.state)

    def run(self, eval_render: bool = True, eval_stride: int = 1,
            progress: bool = False, viewer=None):
        import numpy as np
        import time

        from ..eval.ate import ate_rmse
        from .engine import SLAMResult
        from .state import init_state

        dataset, cfg = self.dataset, self.cfg
        n = len(dataset)
        f0 = dataset[0]
        pose0 = np.asarray(
            f0.gt_c2w if f0.gt_c2w is not None else np.eye(4), np.float32)
        state = init_state(cfg, n, pose0, self.seed)

        fps_cap = cfg.engine.fps_cap
        t0 = time.time()
        for i in range(n):
            fr = dataset[i]
            state = self.fused.step(state, jnp.asarray(fr.depth),
                                    to_chw(fr.rgb),
                                    jnp.bool_(i == n - 1))
            if viewer is not None:
                # pose of frame i: syncs the device (viewer mode trades FPS
                # for live output, like the reference's rerun streaming)
                pose_i = np.asarray(jax.device_get(state.poses[i]))
                viewer.log_frame(i, pose_i, fr.rgb, fr.depth)
            if fps_cap:
                # throttle to fps_cap average (mp_Tracker.py:323-324);
                # requires a host sync, so only bounds — not measures — FPS
                target = t0 + (i + 1) / fps_cap
                now = time.time()
                if now < target:
                    time.sleep(target - now)
            if progress and i % 50 == 0:
                print(f"frame {i}/{n}")
        # force a real host sync (block_until_ready alone can return early
        # through the remote-dispatch relay)
        int(jax.device_get(state.frame_idx))
        elapsed = time.time() - t0
        fps = n / elapsed

        self.state = state
        self._finalize(cfg.engine.mapping_iters_final)
        state = self.state

        poses = np.asarray(jax.device_get(state.poses), np.float64)
        gt = None
        ate = None
        try:
            gt = dataset.gt_poses
            ate = ate_rmse(gt, poses)
        except Exception:
            pass

        psnr_mean = None
        per_frame = None
        if eval_render:
            params = map_params(state.gmap)
            vals = []
            for i in range(0, n, eval_stride):
                fr = dataset[i]
                w2c = invert_se3(jnp.asarray(poses[i], jnp.float32))
                _, p = self.fused.render_eval(params, state.gmap.live, w2c,
                                              to_chw(fr.rgb),
                                              jnp.asarray(fr.depth))
                vals.append(float(p))
            per_frame = np.asarray(vals)
            psnr_mean = float(per_frame.mean())

        return SLAMResult(
            poses=poses, gt_poses=gt, ate_rmse=ate, fps=fps,
            num_gaussians=int(jax.device_get(state.gmap.num_live)),
            psnr=psnr_mean, per_frame_psnr=per_frame,
            kf_total=int(jax.device_get(state.kf_total)),
            kf_stored=int(jax.device_get(state.kf_count)),
            vis_cap_dropped=int(jax.device_get(state.stat_vis_dropped)),
            tile_cap_dropped=int(jax.device_get(state.stat_pair_dropped)))

    # -------------------------------------------------------------- extras
    def evaluate(self, eval_stride: int = 1, poses=None,
                 dump_dir=None):
        """Full-sequence PSNR/SSIM/LPIPS at the final map and poses
        (reference calc_2d_metric, mp_Mapper.py:335-420)."""
        import numpy as np

        from ..eval.image_metrics import evaluate_sequence
        from ..utils.se3 import invert_se3

        assert self.state is not None, "run() first"
        state = self.state
        params = map_params(state.gmap)
        if poses is None:
            poses = np.asarray(jax.device_get(state.poses), np.float64)

        def render_frame(i):
            fr = self.dataset[i]
            w2c = invert_se3(jnp.asarray(poses[i], jnp.float32))
            img, _ = self.fused.render_eval(params, state.gmap.live, w2c,
                                            to_chw(fr.rgb),
                                            jnp.asarray(fr.depth))
            return img

        return evaluate_sequence(render_frame, self.dataset,
                                 len(self.dataset), stride=eval_stride,
                                 depth_scale=self.cfg.intr.depth_scale,
                                 dump_dir=dump_dir)

    def save_ply(self, path: str) -> int:
        """Export the live map in the 3DGS-ecosystem PLY layout
        (gaussian_model.py:619-636)."""
        import numpy as np

        from ..io.ply import save_ply as _save

        assert self.state is not None, "run() first"
        m = self.state.gmap
        live = np.asarray(jax.device_get(m.live))
        return _save(path, jax.device_get(m.xyz), jax.device_get(m.f_dc),
                     jax.device_get(m.f_rest),
                     jax.device_get(m.opacity_logit),
                     jax.device_get(m.log_scaling),
                     jax.device_get(m.rotation), mask=live)

    def save_checkpoint(self, path: str) -> None:
        """Write the full fused SLAMState as a resumable npz."""
        from ..io.checkpoint import save_fused_state

        assert self.state is not None, "run() first"
        save_fused_state(self.state, path)

    def load_checkpoint(self, path: str) -> None:
        from ..io.checkpoint import load_fused_state

        self.state = load_fused_state(path)
