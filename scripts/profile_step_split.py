"""Split the fused frame step's wall time: tracking-side vs mapping-side.

Builds the same mid-run state as profile_stages, then slope-times the FULL
jitted step compiled at mapping_iters_per_frame = 0, 1, 2.  The deltas give
the true per-opt-iteration cost inside the step (including anything the
isolated stage timings miss), and iters=0 gives the tracking+keyframe
floor.
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


def main():
    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine
    from gs_icp_slam_tpu.slam.fused import make_fused_step, to_chw
    from gs_icp_slam_tpu.slam.state import init_state

    width, height = 1200, 680
    NWARM = 12
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=NWARM + 2)
    cfg = synthetic_config(seq.intr, downsample_rate=10,
                           capacity=1 << 18, target_capacity=1 << 16,
                           visible_capacity=1 << 16)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2))
    stage = int(os.environ.get("GS_STAGE", "0"))
    if stage:
        cfg = cfg.replace(opt=dataclasses.replace(
            cfg.opt, training_stage=stage))
    eng = FusedEngine(seq, cfg)
    frames = [seq[i] for i in range(NWARM + 2)]
    depths = [jnp.asarray(f.depth) for f in frames]
    rgbs = [to_chw(f.rgb) for f in frames]
    state = eng.fused.pin_state(init_state(
        cfg, NWARM + 2, np.asarray(frames[0].gt_c2w, np.float32)))
    for i in range(NWARM):
        state = eng.fused.step(state, depths[i], rgbs[i], jnp.bool_(False),
                               None, None)
    nb, tb = eng._pick_buckets(int(jax.device_get(state.gmap.n)))
    print("live:", int(jax.device_get(state.gmap.num_live)),
          "buckets:", nb, tb, flush=True)

    d, r = depths[NWARM], rgbs[NWARM]
    for iters in (0, 1, 2, 4):
        c2 = cfg.replace(engine=dataclasses.replace(
            cfg.engine, mapping_iters_per_frame=iters))
        fused = make_fused_step(c2, eng.filt)
        def copy_state(s):
            # .copy() resets layouts; re-pin (fused jits pin the stores)
            return fused.pin_state(
                jax.tree.map(lambda x: x.copy() if hasattr(x, "dtype")
                             else x, s))

        st = copy_state(state)  # step donates arg 0: never reuse a donated
        # warm compile + state shape settle
        for _ in range(3):
            st = fused.step(st, d, r, jnp.bool_(False), nb, tb)
        jax.block_until_ready(st.gmap.xyz)
        times = {}
        for reps in (4, 20):
            stt = copy_state(st)
            jax.block_until_ready(stt.gmap.xyz)
            t0 = time.perf_counter()
            for _ in range(reps):
                stt = fused.step(stt, d, r, jnp.bool_(False), nb, tb)
            jax.block_until_ready(stt.gmap.xyz)
            times[reps] = time.perf_counter() - t0
        ms = (times[20] - times[4]) / 16 * 1000  # slope: cancels sync const
        print(f"iters={iters}: {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
