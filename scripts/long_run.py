"""Long-run stability record (VERDICT r4 weak #6): 400 frames at the
production config — keyframe eviction engaged (Kc=64 < keyframes
selected), capacity buckets crossing at least one growth recompile —
reporting windowed FPS, map occupancy, and in-run PSNR stability.

Replica sequences are 2000 frames (replica.sh:97-104); the 36-frame bench
never engages eviction or bucket growth.  This script records how the
fused engine behaves when they do.  Prints one JSON blob for
PROFILE_r05.json's long_run section.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.eval.ate import ate_rmse
    from gs_icp_slam_tpu.models import map_params
    from gs_icp_slam_tpu.slam import FusedEngine
    from gs_icp_slam_tpu.slam.fused import to_chw
    from gs_icp_slam_tpu.slam.state import init_state
    from gs_icp_slam_tpu.utils.se3 import invert_se3

    N = int(os.environ.get("GS_LONG_FRAMES", "400"))
    WINDOW = 50
    CHUNK = 5
    width, height = 1200, 680
    # corner-oscillating trajectory: every frame keeps >= 2 walls in view
    # (the default sweep dwells ~100 frames on ONE wall past frame ~75 at
    # this step — a geometric null space no geometry-only ICP survives;
    # first long-run attempt lost tracking exactly there, ATE 92 cm)
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=N, angular_step=0.008,
                       trajectory="corner")
    cfg = synthetic_config(seq.intr, downsample_rate=10,
                           capacity=1 << 19, target_capacity=1 << 16,
                           visible_capacity=1 << 16)
    KC = int(os.environ.get("GS_LONG_KC", "32"))  # 400 frames select ~42
    # keyframes: Kc=32 ENGAGES reservoir eviction inside the run
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2, keyframe_capacity=KC))
    # bounded-memory insertion: revisit-heavy orbits otherwise grow the
    # map linearly with keyframes (the reference inserts ALL points per
    # keyframe; 524k live + 440k visible-cap drops on the first attempt)
    cfg = cfg.replace(kf=dataclasses.replace(
        cfg.kf, insert_dedup_sqd=cfg.kf.overlapped_th))
    eng = FusedEngine(seq, cfg)

    print(f"synthesizing {N} frames...", flush=True)
    depths, rgbs, gts = [], [], []
    for i in range(N):
        fr = seq[i]
        depths.append(jnp.asarray(fr.depth))
        rgbs.append(to_chw(fr.rgb))
        gts.append(np.asarray(fr.gt_c2w, np.float64))
    state = eng.fused.pin_state(
        init_state(cfg, N, np.asarray(gts[0], np.float32)))

    windows = []
    buckets_used = set()
    nb, tb = eng._pick_buckets(0)
    buckets_used.add((nb, tb))
    t_all = time.time()
    i = 0
    twin = time.time()
    while i < N:
        if i % eng.BUCKET_SYNC < CHUNK and i > 0:
            n_now = int(jax.device_get(state.gmap.n))
            nbtb = eng._pick_buckets(n_now)
            if nbtb != (nb, tb):
                buckets_used.add(nbtb)
            nb, tb = nbtb
        c = min(CHUNK, N - i)
        if c == CHUNK:
            state = eng.fused.step_chunk(
                state, jnp.stack(depths[i:i + c]), jnp.stack(rgbs[i:i + c]),
                jnp.asarray([j == N - 1 for j in range(i, i + c)]), nb, tb)
        else:
            for j in range(i, i + c):
                state = eng.fused.step(state, depths[j], rgbs[j],
                                       jnp.bool_(j == N - 1), nb, tb)
        i += c
        if i % WINDOW == 0:
            int(jax.device_get(state.frame_idx))
            now = time.time()
            windows.append({
                "frames": f"{i - WINDOW}-{i}",
                "fps": round(WINDOW / (now - twin), 2),
                "num_live": int(jax.device_get(state.gmap.num_live)),
                "kf_stored": int(jax.device_get(state.kf_count)),
                "kf_total": int(jax.device_get(state.kf_total)),
            })
            print(windows[-1], flush=True)
            twin = time.time()
    wall = time.time() - t_all

    # per-window in-run PSNR at the FINAL map (stability of the map over
    # the trajectory; eviction-era keyframes must not be forgotten)
    params = map_params(state.gmap)
    poses = np.asarray(jax.device_get(state.poses), np.float64)
    psnr_win = []
    for w0 in range(0, N, WINDOW):
        vals = []
        for k in range(w0, min(w0 + WINDOW, N), 10):
            w2c = invert_se3(jnp.asarray(poses[k], jnp.float32))
            _, p = eng.fused.render_eval(params, state.gmap.live, w2c,
                                         rgbs[k], depths[k])
            vals.append(float(jax.device_get(p)))
        psnr_win.append(round(float(np.mean(vals)), 2))

    ate = float(ate_rmse(np.stack(gts), poses))
    fps_all = [w["fps"] for w in windows[1:]]  # window 0 pays compiles
    out = {
        "frames": N,
        "config": {"kc": KC, "capacity": 1 << 19, "iters": 2,
                   "chunk": CHUNK, "angular_step": 0.008},
        "wall_s": round(wall, 1),
        "fps_mean_after_warm": round(float(np.mean(fps_all)), 2),
        "fps_min_window": round(float(np.min(fps_all)), 2),
        "fps_windows": windows,
        "psnr_per_window_at_final_map": psnr_win,
        "ate_rmse_cm": round(ate * 100, 3),
        "kf_total": int(jax.device_get(state.kf_total)),
        "kf_stored": int(jax.device_get(state.kf_count)),
        "eviction_engaged": int(jax.device_get(state.kf_total)) > KC,
        "num_live_final": int(jax.device_get(state.gmap.num_live)),
        "capacity_saturated": int(jax.device_get(state.gmap.n)) >= (1 << 19),
        "bucket_configs_used": sorted([str(b) for b in buckets_used]),
        "recompiles_from_bucket_growth": max(0, len(buckets_used) - 1),
        "vis_cap_dropped": int(jax.device_get(state.stat_vis_dropped)),
        "tile_cap_dropped": int(jax.device_get(state.stat_pair_dropped)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
