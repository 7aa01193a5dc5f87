"""Per-stage TPU timing of the fused SLAM step at bench geometry.

Times, in isolation: preprocess+gicp tracking, one mapping opt step
(raster fwd+bwd+adam), raster forward alone, gaussian insertion, and
target export. Prints ms per call so optimization effort goes where the
time is.
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.datasets import open_dataset
from gs_icp_slam_tpu.slam import FusedEngine
from gs_icp_slam_tpu.slam.fused import make_fused_step, to_chw
from gs_icp_slam_tpu.slam.state import init_state


def _checksum(out):
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(jnp.sum(x) for x in leaves[:1])


def timeit(name, fn, *args, n=10, **kw):
    # device_get of a scalar checksum is the only reliable host sync
    # through the remote axon relay (block_until_ready returns early)
    float(jax.device_get(_checksum(fn(*args, **kw))))
    t0 = time.time()
    acc = []
    for _ in range(n):
        acc.append(_checksum(fn(*args, **kw)))
    float(jax.device_get(sum(acc)))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:35s} {dt:8.2f} ms")


def main():
    width, height = 1200, 680
    warm = 6
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=warm + 2)
    cfg = synthetic_config(seq.intr, downsample_rate=10,
                           capacity=1 << 18, target_capacity=1 << 16,
                           visible_capacity=1 << 16)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2))
    eng = FusedEngine(seq, cfg)

    frames = [seq[i] for i in range(warm + 2)]
    depths = [jnp.asarray(f.depth) for f in frames]
    rgbs = [to_chw(f.rgb) for f in frames]
    pose0 = np.asarray(frames[0].gt_c2w, np.float32)
    state = init_state(cfg, warm + 2, pose0)
    for i in range(warm):
        state = eng.fused.step(state, depths[i], rgbs[i], jnp.bool_(False))
    jax.block_until_ready(state.gmap.xyz)
    print(f"num_live={int(jax.device_get(state.gmap.num_live))} "
          f"kf={int(jax.device_get(state.kf_count))}")

    # full fused step (no donation here: state reused across reps)
    step_nodonate = jax.jit(lambda s, d, r: eng.fused.step.__wrapped__(
        s, d, r, jnp.bool_(False)))
    timeit("fused step (full frame)", step_nodonate, state, depths[warm],
           rgbs[warm])

    # pieces ---------------------------------------------------------------
    from gs_icp_slam_tpu.models import map_params
    from gs_icp_slam_tpu.ops.gicp import (gicp_align, make_source,
                                          source_correspondences)
    from gs_icp_slam_tpu.ops.rasterize import rasterize_tiled
    from gs_icp_slam_tpu.utils.losses import mapping_loss
    from functools import partial

    intr = cfg.intr
    filt = eng.filt
    flat_idxs = jnp.asarray(filt.flat_idxs)
    x_pre = jnp.asarray(filt.x_pre)
    y_pre = jnp.asarray(filt.y_pre)
    gicp_cfg = cfg.gicp

    @jax.jit
    def track_only(state, depth_raw, rgb_u8):
        z = depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        trackable = valid & (z <= intr.depth_trunc)
        source = make_source(points, valid, gicp_cfg, trackable=trackable)
        init_T = state.poses[state.frame_idx - 1]
        T, _ = gicp_align(source, state.target, init_T, gicp_cfg)
        _, sqd = source_correspondences(T, source.points, state.target)
        return T, sqd

    timeit("tracking (gicp align + corres)", track_only, state,
           depths[warm], rgbs[warm])

    @jax.jit
    def source_only(depth_raw):
        z = depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        return make_source(points, valid, gicp_cfg, trackable=valid)

    timeit("make_source (source covariances)", source_only, depths[warm])

    rcfg = cfg.render
    bg = jnp.asarray(rcfg.bg_color, jnp.float32)
    raster = partial(
        rasterize_tiled, sh_degree=cfg.map.sh_degree, width=intr.width,
        height=intr.height, tile=rcfg.tile_size,
        visible_cap=rcfg.visible_capacity, tile_span=rcfg.tile_span,
        tile_cap=rcfg.max_per_tile, chunk=rcfg.composite_chunk)
    fx, fy = intr.fx, intr.fy
    rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0

    params = map_params(state.gmap)
    live = state.gmap.live
    w2c = state.kf_w2c[0]
    rgb0 = state.kf_rgb[0]
    dep0 = state.kf_depth[0]

    def _sh(p):
        return jnp.concatenate([p["f_dc"][:, None, :], p["f_rest"]], axis=1)

    @jax.jit
    def fwd_only(params, live, w2c):
        out = raster(params["xyz"], params["rotation"],
                     jnp.exp(params["log_scaling"]),
                     jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                     _sh(params), w2c, live, bg, fx, fy, rcx, rcy)
        return out.color, out.depth

    timeit("raster forward only", fwd_only, params, live, w2c)

    @jax.jit
    def fwd_bwd(params, live, w2c, rgb_u8, depth_raw):
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
            return loss

        return jax.value_and_grad(loss_fn)(params)

    timeit("raster fwd+bwd (loss+grads)", fwd_bwd, params, live, w2c,
           rgb0, dep0)

    from gs_icp_slam_tpu.models import adam_step, map_lr_tree
    lrs = map_lr_tree(cfg.opt)
    _, grads = fwd_bwd(params, live, w2c, rgb0, dep0)

    @jax.jit
    def adam_only(params, grads, adam):
        return adam_step(params, grads, adam, lrs, live,
                         b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                         eps=cfg.opt.adam_eps)

    timeit("adam step only", adam_only, params, grads, state.adam)

    from gs_icp_slam_tpu.models import add_gaussians, trackable_export
    from gs_icp_slam_tpu.ops.gicp import target_from_gaussians

    @jax.jit
    def insert_only(gmap, depth_raw, rgb_u8):
        z = depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
        colors = (rgb_u8.reshape(3, -1)[:, flat_idxs].T
                  .astype(jnp.float32) / 255.0)
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        source = make_source(points, valid, gicp_cfg, trackable=valid)
        return add_gaussians(gmap, points, colors, source.quat,
                             source.scales, z, valid, valid,
                             init_opacity=cfg.map.init_opacity)

    timeit("insert gaussians (incl cov)", insert_only, state.gmap,
           depths[warm], rgbs[warm])

    @jax.jit
    def export_only(gmap):
        pts, rots, scales, valid = trackable_export(
            gmap, cfg.map.trackable_opacity_th, cfg.engine.target_capacity)
        return target_from_gaussians(pts, rots, scales, valid, gicp_cfg)

    timeit("export target (map->tracker)", export_only, state.gmap)


if __name__ == "__main__":
    main()
