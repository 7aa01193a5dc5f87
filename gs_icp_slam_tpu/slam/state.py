"""Device-resident SLAM state: everything the per-frame step touches.

One pytree in HBM — gaussian map + Adam moments, G-ICP target, keyframe
store (poses + full-resolution RGB-D), pose history, counters, PRNG key.
The reference spreads this across two processes and shared-memory buffers
(gs_icp_slam.py:81-109); collapsing it into one pytree is what lets the
entire frame step run as a single XLA program with no host round trips
(the remote-dispatch latency of one host pull costs more than the whole
frame's compute).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import AdamState, GaussianMap, adam_init, empty_map, map_params
from ..ops.gicp import GICPTarget, empty_target


class SLAMState(NamedTuple):
    gmap: GaussianMap
    adam: AdamState
    target: GICPTarget           # fixed capacity (Tc)
    poses: jnp.ndarray           # (F, 4, 4) c2w history
    frame_idx: jnp.ndarray       # () int32 — frames processed so far
    kf_w2c: jnp.ndarray          # (Kc, 4, 4)
    kf_rgb: jnp.ndarray          # (Kc, 3, H, W) uint8 — channel-first:
                                 # a trailing dim of 3 would be padded to
                                 # the 128-lane TPU tile (42x HBM blowup)
    kf_depth: jnp.ndarray        # (Kc, H, W) float32 raw units
    kf_count: jnp.ndarray        # () int32 — occupied keyframe slots
    kf_total: jnp.ndarray        # () int32 — keyframes EVER selected; when
                                 # > kf_count the store has evicted (the
                                 # reference keeps every keyframe,
                                 # mp_Mapper.py:174-179; we hold a uniform
                                 # reservoir sample of the same set)
    new_kf: jnp.ndarray          # () int32 — pending new keyframe idx or -1
    from_last_kf: jnp.ndarray    # () int32
    train_iter: jnp.ndarray      # () int32
    rng: jnp.ndarray             # PRNG key
    last_ratio: jnp.ndarray      # () float32 — overlap ratio (diagnostics)
    stat_vis_dropped: jnp.ndarray   # () int32 — max visible-cap overflow seen
    stat_pair_dropped: jnp.ndarray  # () int32 — max tile-cap overflow seen


def init_state(cfg, num_frames: int, pose0: np.ndarray,
               seed: int = 0) -> SLAMState:
    intr = cfg.intr
    kc = cfg.engine.keyframe_capacity
    tc = cfg.engine.target_capacity
    gmap = empty_map(cfg.map.capacity, cfg.map.sh_degree)
    poses = jnp.tile(jnp.asarray(pose0, jnp.float32)[None], (num_frames, 1, 1))
    return SLAMState(
        gmap=gmap,
        adam=adam_init(map_params(gmap)),
        target=empty_target(tc),
        poses=poses,
        frame_idx=jnp.int32(0),
        kf_w2c=jnp.zeros((kc, 4, 4), jnp.float32),
        kf_rgb=jnp.zeros((kc, 3, intr.height, intr.width), jnp.uint8),
        kf_depth=jnp.zeros((kc, intr.height, intr.width), jnp.float32),
        kf_count=jnp.int32(0),
        kf_total=jnp.int32(0),
        new_kf=jnp.int32(-1),
        from_last_kf=jnp.int32(0),
        train_iter=jnp.int32(0),
        rng=jax.random.PRNGKey(seed),
        last_ratio=jnp.float32(1.0),
        stat_vis_dropped=jnp.int32(0),
        stat_pair_dropped=jnp.int32(0),
    )
