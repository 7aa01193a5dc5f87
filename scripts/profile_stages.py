"""Per-stage timing of the fused SLAM frame at bench load.

Builds a representative mid-run state (synthetic scene at Replica geometry,
same config as bench.py), then times each stage of the frame step.

Timing method: each stage runs R times INSIDE one jit (lax.scan, salted to
defeat CSE/hoisting), synced once; per-op cost = (t(R) - t(1)) / (R - 1).
This cancels the remote-dispatch round-trip (5-150 ms on the axon relay
depending on congestion) that makes naive per-call timing unusable.

Pass --buckets to measure at the engine's capacity buckets (bench path).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


from gs_icp_slam_tpu.utils.profiling import slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", action="store_true",
                    help="measure at engine-picked capacity buckets")
    ap.add_argument("--reps", type=int, default=8)
    args_cli = ap.parse_args()

    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine
    from gs_icp_slam_tpu.slam.fused import (make_mapping_primitives, to_chw)
    from gs_icp_slam_tpu.slam.state import init_state
    from gs_icp_slam_tpu.models import (adam_step, map_lr_tree, map_params,
                                        trackable_export)
    from gs_icp_slam_tpu.ops.gicp import (gicp_align, make_source,
                                          target_from_gaussians)

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
    state = eng.fused.pin_state(init_state(cfg, NWARM + 2, pose0))
    nb = tb = None
    for i in range(NWARM):
        state = eng.fused.step(state, depths[i], rgbs[i], jnp.bool_(False),
                               nb, tb)
    n_live = int(jax.device_get(state.gmap.num_live))
    if args_cli.buckets:
        nb, tb = eng._pick_buckets(int(jax.device_get(state.gmap.n)))
    print(f"num_live: {n_live} kf_count:",
          int(jax.device_get(state.kf_count)), f"buckets: {nb} {tb}")

    intr = cfg.intr
    filt = eng.filt
    flat_idxs = jnp.asarray(filt.flat_idxs)
    x_pre = jnp.asarray(filt.x_pre)
    y_pre = jnp.asarray(filt.y_pre)
    depth_raw, rgb_u8 = depths[NWARM], rgbs[NWARM]

    prim = make_mapping_primitives(cfg, n_cap=nb)
    lrs = map_lr_tree(cfg.opt)
    tc = cfg.engine.target_capacity

    def preprocess(depth_raw, rgb_u8):
        z = (depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32)
             / intr.depth_scale)
        colors = (rgb_u8.reshape(3, -1)[:, flat_idxs].T.astype(jnp.float32)
                  / 255.0)
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        trackable = valid & (z <= intr.depth_trunc)
        return points, colors, valid, trackable

    points, colors, valid, trackable = jax.jit(preprocess)(depth_raw, rgb_u8)
    source = jax.jit(lambda p, v, t: make_source(p, v, cfg.gicp,
                                                 trackable=t))(
        points, valid, trackable)
    init_T = state.poses[NWARM - 1]

    # bucket-sliced views for the tracking stages
    if tb is not None:
        from gs_icp_slam_tpu.ops.gicp import GICPTarget
        tgt = GICPTarget(points=state.target.points[:, :tb],
                         cov6=state.target.cov6[:, :tb],
                         valid=state.target.valid[:tb],
                         nn_bias=state.target.nn_bias[:, :tb])
    else:
        tgt = state.target

    gmap_v = state.gmap
    if nb is not None:
        from gs_icp_slam_tpu.models import GaussianMap
        gmap_v = GaussianMap(**{
            f: (getattr(state.gmap, f) if f == "n"
                else getattr(state.gmap, f)[:nb])
            for f in state.gmap._fields})

    params = map_params(gmap_v)
    live = gmap_v.live
    w2c = state.kf_w2c[0]
    rgb0 = state.kf_rgb[0]
    dep0 = state.kf_depth[0]

    adam0 = jax.tree.map(jnp.zeros_like, params)
    from gs_icp_slam_tpu.models import AdamState
    adam_st = AdamState(m=adam0, v=jax.tree.map(jnp.zeros_like, params),
                        step=jnp.int32(1))
    _, grads = jax.jit(jax.value_and_grad(
        lambda p: prim.opt_loss(p, live, w2c, rgb0, dep0)[0]))(params)

    out_cap = tc if nb is None else min(tc, nb)

    stages = {
        "preprocess": lambda s: preprocess(depth_raw + s, rgb_u8),
        "make_source(knn+cov)": lambda s: make_source(
            points + s, valid, cfg.gicp, trackable=trackable),
        "gicp_align": lambda s: gicp_align(
            source._replace(points=source.points + s), tgt, init_T,
            cfg.gicp),
        "export_target": lambda s: target_from_gaussians(
            *trackable_export(gmap_v._replace(xyz=gmap_v.xyz + s),
                              cfg.map.trackable_opacity_th, out_cap),
            cfg.gicp, capacity=tc),
        "raster_fwd": lambda s: prim.raster(
            params["xyz"] + s, params["rotation"],
            jnp.exp(params["log_scaling"]),
            jax.nn.sigmoid(params["opacity_logit"][:, 0]),
            prim.sh_concat(params), w2c, live,
            jnp.zeros((3,), jnp.float32), intr.fx, intr.fy,
            (intr.width - 1) / 2, (intr.height - 1) / 2).color,
        "opt_loss(fwd+ssim)": lambda s: prim.opt_loss(
            {**params, "xyz": params["xyz"] + s}, live, w2c, rgb0, dep0)[0],
        "loss_grad(fwd+bwd)": lambda s: jax.grad(
            lambda p: prim.opt_loss(p, live, w2c, rgb0, dep0)[0])(
            {**params, "xyz": params["xyz"] + s}),
        "adam_step": lambda s: adam_step(
            {**params, "xyz": params["xyz"] + s}, grads, adam_st, lrs,
            live, b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
            eps=cfg.opt.adam_eps),
        # return params+loss so the backward can't be dead-code-eliminated
        "full opt_step": lambda s: prim.opt_step(
            {**params, "xyz": params["xyz"] + s}, adam_st, live, w2c,
            rgb0, dep0)[:3],
    }
    measured = {}
    for name, fn in stages.items():
        ms = slope_time(fn, R=args_cli.reps)
        measured[name] = ms
        print(f"{name:24s} {ms:8.2f} ms", flush=True)

    # roofline: attainable time vs measured for the dominant stages
    from gs_icp_slam_tpu.utils.profiling import (detect_chip,
                                                 gicp_iteration_model,
                                                 raster_forward_model)
    chip = detect_chip()
    ncap_eff = nb or cfg.map.capacity
    vcap_eff = min(cfg.render.visible_capacity, ncap_eff)
    tiles = (-(-width // 16)) * (-(-height // 16))
    rfm = raster_forward_model(ncap_eff, vcap_eff, tiles, 16,
                               cfg.render.max_per_tile,
                               pairs_real=n_live * 4, occupancy=n_live * 4)
    att = rfm.attainable_ms(chip)
    got = measured.get("raster_fwd", 0)
    print(f"[roofline {chip.name}] raster_fwd attainable ~{att:.2f} ms, "
          f"measured {got:.2f} ms -> {100 * att / max(got, 1e-9):.0f}% "
          f"of roofline", flush=True)
    gim = gicp_iteration_model(filt.num_points, tb or tc)
    print(f"[roofline {chip.name}] gicp 1 iter attainable "
          f"~{gim.attainable_ms(chip):.2f} ms", flush=True)

    # fused step: ping-pong wall time (donation-aware), roundtrip included
    st = state
    for r in range(3):
        st = eng.fused.step(st, depths[NWARM], rgbs[NWARM],
                            jnp.bool_(False), nb, tb)
    jax.block_until_ready(st.gmap.xyz)
    t0 = time.perf_counter()
    reps = 20
    for r in range(reps):
        st = eng.fused.step(st, depths[NWARM], rgbs[NWARM],
                            jnp.bool_(False), nb, tb)
    jax.block_until_ready(st.gmap.xyz)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{'fused_full_step (wall)':24s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
