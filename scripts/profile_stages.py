"""Per-stage timing of the fused SLAM frame at bench load.

Builds a representative mid-run state (synthetic scene at Replica geometry,
same config as bench.py), then times each stage of the frame step as its
own jitted function: tracking, insert, target export, raster fwd, raster
fwd+bwd, adam, full mapping iter, full fused step.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0  # ms


def main():
    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine
    from gs_icp_slam_tpu.slam.fused import to_chw, make_fused_step
    from gs_icp_slam_tpu.slam.state import init_state
    from gs_icp_slam_tpu.models import map_params
    from gs_icp_slam_tpu.ops.gicp import (gicp_align, make_source,
                                          source_correspondences)
    from gs_icp_slam_tpu.ops.rasterize import rasterize_tiled
    from gs_icp_slam_tpu.utils.losses import mapping_loss
    from functools import partial

    width, height = 1200, 680
    NWARM = 12
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=NWARM + 2)
    cfg = synthetic_config(seq.intr, downsample_rate=10,
                           capacity=1 << 18, target_capacity=1 << 16,
                           visible_capacity=1 << 16)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2))

    eng = FusedEngine(seq, cfg)
    frames = [seq[i] for i in range(NWARM + 2)]
    depths = [jnp.asarray(f.depth) for f in frames]
    rgbs = [to_chw(f.rgb) for f in frames]
    pose0 = np.asarray(frames[0].gt_c2w, np.float32)
    state = init_state(cfg, NWARM + 2, pose0)
    for i in range(NWARM):
        state = eng.fused.step(state, depths[i], rgbs[i], jnp.bool_(False))
    jax.block_until_ready(state.gmap.xyz)
    print("num_live:", int(jax.device_get(state.gmap.num_live)),
          "kf_count:", int(jax.device_get(state.kf_count)))

    intr = cfg.intr
    filt = eng.filt
    flat_idxs = jnp.asarray(filt.flat_idxs)
    x_pre = jnp.asarray(filt.x_pre)
    y_pre = jnp.asarray(filt.y_pre)
    depth_raw, rgb_u8 = depths[NWARM], rgbs[NWARM]

    # ---- stage fns ----
    @jax.jit
    def preprocess(depth_raw, rgb_u8):
        z = depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
        colors = (rgb_u8.reshape(3, -1)[:, flat_idxs].T.astype(jnp.float32)
                  / 255.0)
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        trackable = valid & (z <= intr.depth_trunc)
        return points, colors, valid, trackable

    points, colors, valid, trackable = preprocess(depth_raw, rgb_u8)

    @jax.jit
    def mk_source(points, valid, trackable):
        return make_source(points, valid, cfg.gicp, trackable=trackable)

    source = mk_source(points, valid, trackable)
    init_T = state.poses[NWARM - 1]

    @jax.jit
    def track(source, target, init_T):
        return gicp_align(source, target, init_T, cfg.gicp)

    T_est, n_iters, _, _ = track(source, state.target, init_T)
    print("gicp iters:", int(jax.device_get(n_iters)))

    @jax.jit
    def corr(T, pts, target):
        return source_correspondences(T, pts, target)

    # export target
    from gs_icp_slam_tpu.models import trackable_export
    from gs_icp_slam_tpu.ops.gicp import target_from_gaussians
    tc = cfg.engine.target_capacity

    @jax.jit
    def export(gmap):
        pts, rots, scales, v = trackable_export(
            gmap, cfg.map.trackable_opacity_th, tc)
        return target_from_gaussians(pts, rots, scales, v, cfg.gicp,
                                     capacity=tc)

    # raster fwd / fwd+bwd
    rcfg = cfg.render
    bg = jnp.asarray(rcfg.bg_color, jnp.float32)
    fx, fy = intr.fx, intr.fy
    rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0
    raster = partial(
        rasterize_tiled, sh_degree=cfg.map.sh_degree, width=intr.width,
        height=intr.height, tile=rcfg.tile_size,
        visible_cap=rcfg.visible_capacity, tile_span=rcfg.tile_span,
        tile_cap=rcfg.max_per_tile, chunk=rcfg.composite_chunk,
        want_used=False)

    params = map_params(state.gmap)
    live = state.gmap.live
    w2c = state.kf_w2c[0]
    gt_img = state.kf_rgb[0].astype(jnp.float32) / 255.0
    gt_depth = state.kf_depth[0] / intr.depth_scale

    def _sh(p):
        return jnp.concatenate([p["f_dc"][:, None, :], p["f_rest"]], axis=1)

    @jax.jit
    def raster_fwd(params, live, w2c):
        out = raster(params["xyz"], params["rotation"],
                     jnp.exp(params["log_scaling"]),
                     jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                     _sh(params), w2c, live, bg, fx, fy, rcx, rcy)
        return out.color, out.depth

    @jax.jit
    def loss_grad(params, live, w2c, gt_img, gt_depth):
        def loss_fn(p):
            out = raster(p["xyz"], p["rotation"], jnp.exp(p["log_scaling"]),
                         jax.nn.sigmoid(p["opacity_logit"][:, 0]), _sh(p),
                         w2c, live, bg, fx, fy, rcx, rcy)
            loss, _ = mapping_loss(out.color, out.depth, gt_img, gt_depth,
                                   lambda_dssim=cfg.opt.lambda_dssim,
                                   depth_weight=cfg.opt.depth_loss_weight,
                                   d_max=cfg.opt.depth_d_max)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    @jax.jit
    def loss_only(params, live, w2c, gt_img, gt_depth):
        out = raster(params["xyz"], params["rotation"],
                     jnp.exp(params["log_scaling"]),
                     jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                     _sh(params), w2c, live, bg, fx, fy, rcx, rcy)
        loss, _ = mapping_loss(out.color, out.depth, gt_img, gt_depth,
                               lambda_dssim=cfg.opt.lambda_dssim,
                               depth_weight=cfg.opt.depth_loss_weight,
                               d_max=cfg.opt.depth_d_max)
        return loss

    from gs_icp_slam_tpu.models import adam_step, map_lr_tree
    lrs = map_lr_tree(cfg.opt)

    _, grads = loss_grad(params, live, w2c, gt_img, gt_depth)

    @jax.jit
    def adam(params, grads, adam_st):
        return adam_step(params, grads, adam_st, lrs, live,
                         b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                         eps=cfg.opt.adam_eps)

    stages = {
        "preprocess": lambda: preprocess(depth_raw, rgb_u8),
        "make_source(knn+cov)": lambda: mk_source(points, valid, trackable),
        "gicp_align": lambda: track(source, state.target, init_T),
        "source_corr": lambda: corr(T_est, source.points, state.target),
        "export_target": lambda: export(state.gmap),
        "raster_fwd": lambda: raster_fwd(params, live, w2c),
        "loss_only(fwd+ssim)": lambda: loss_only(params, live, w2c, gt_img,
                                                 gt_depth),
        "loss_grad(fwd+bwd)": lambda: loss_grad(params, live, w2c, gt_img,
                                                gt_depth),
        "adam_step": lambda: adam(params, grads, state.adam),
    }
    for name, fn in stages.items():
        ms = timeit(fn)
        print(f"{name:24s} {ms:8.2f} ms")

    # fused step donates its state arg: time it by ping-ponging the state
    # through successive calls (same as the real frame loop) instead of
    # re-calling with an already-donated buffer.
    st = state
    for r in range(3):
        st = eng.fused.step(st, depths[NWARM], rgbs[NWARM], jnp.bool_(False))
    jax.block_until_ready(st.gmap.xyz)
    t0 = time.perf_counter()
    reps = 20
    for r in range(reps):
        st = eng.fused.step(st, depths[NWARM], rgbs[NWARM], jnp.bool_(False))
    jax.block_until_ready(st.gmap.xyz)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{'fused_full_step':24s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
