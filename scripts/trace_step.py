"""Capture a jax.profiler trace of the fused step at bench load and print
the top device ops by total duration (reads the trace.json.gz)."""
from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine
    from gs_icp_slam_tpu.slam.fused import to_chw
    from gs_icp_slam_tpu.slam.state import init_state

    width, height = 1200, 680
    NWARM = 12
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=NWARM + 8)
    cfg = synthetic_config(seq.intr, downsample_rate=10,
                           capacity=1 << 18, target_capacity=1 << 16,
                           visible_capacity=1 << 16)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2))
    eng = FusedEngine(seq, cfg)
    frames = [seq[i] for i in range(NWARM + 8)]
    depths = [jnp.asarray(f.depth) for f in frames]
    rgbs = [to_chw(f.rgb) for f in frames]
    state = eng.fused.pin_state(init_state(
        cfg, NWARM + 8, np.asarray(frames[0].gt_c2w, np.float32)))
    for i in range(NWARM):
        state = eng.fused.step(state, depths[i], rgbs[i], jnp.bool_(False),
                               None, None)
    nb, tb = eng._pick_buckets(int(jax.device_get(state.gmap.n)))
    # warm the bucketed compile
    state = eng.fused.step(state, depths[NWARM], rgbs[NWARM],
                           jnp.bool_(False), nb, tb)
    jax.block_until_ready(state.gmap.xyz)

    os.system("rm -rf /tmp/steptrace")
    with jax.profiler.trace("/tmp/steptrace"):
        for i in range(NWARM + 1, NWARM + 7):
            state = eng.fused.step(state, depths[i], rgbs[i],
                                   jnp.bool_(False), nb, tb)
        jax.block_until_ready(state.gmap.xyz)

    path = sorted(glob.glob(
        "/tmp/steptrace/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # us
        # keep only device-lane events (XLA op names)
        args = ev.get("args", {})
        if not args or "long_name" not in args and "name" not in args:
            pass
        tot[name] += dur
        cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
    for name, us in rows:
        print(f"{us/1000/6:9.3f} ms/frame x{cnt[name]:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
