"""Multi-chip map optimization: sharded gaussian map + keyframe-parallel
mapping steps.

This is the scaling axis the reference lacks entirely (its map never leaves
one GPU, SURVEY §5 long-context): here the map parameters and Adam moments
are sharded along the capacity axis over a device mesh (FSDP-style), and
each device renders a DIFFERENT keyframe per step.  XLA inserts the
collectives from the sharding annotations alone:

  * forward: all-gather of the (small) splat parameters per device
  * backward: reduce-scatter of parameter gradients back to the shards
  * Adam: shard-local, no communication

One parallel step therefore does `n_devices` keyframe-iterations of the
reference mapper (mp_Mapper.py:196-248) per round trip, turning the
mapper's serial free-running loop into the batch dimension.

This module is the STANDALONE batched mapping step (used by the scaling
harness, scripts/bench_scaling.py); the integrated multi-chip mode lives
in slam/fused.py (`make_fused_step(..., mesh=...)` /
`FusedEngine(..., mesh=...)`) with its sharding layout in sharded.py.
Both are exercised on the 8-virtual-device CPU mesh by
tests/test_parallel.py.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SLAMConfig
from ..models import AdamState, adam_step, map_lr_tree
from ..ops.rasterize import rasterize_tiled
from ..utils.losses import mapping_loss


def make_mesh(devices=None, axis: str = "map") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_map_state(mesh: Mesh, params: dict, adam: AdamState,
                    live: jnp.ndarray, axis: str = "map"):
    """Place map params/moments/live sharded along capacity over the mesh."""
    shard = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, shard)

    params = jax.tree.map(put, params)
    adam = AdamState(m=jax.tree.map(put, adam.m),
                     v=jax.tree.map(put, adam.v),
                     step=jax.device_put(adam.step,
                                         NamedSharding(mesh, P())))
    live = put(live)
    return params, adam, live


class ParallelMappingStep(NamedTuple):
    step: Callable  # (params, adam, live, w2c_b, rgb_b (B,3,H,W), depth_b)
    mesh: Mesh
    batch: int      # keyframes consumed per call (= mesh size)


def make_parallel_opt_step(mesh: Mesh, cfg: SLAMConfig,
                           axis: str = "map") -> ParallelMappingStep:
    """Build the jitted multi-device mapping step for a config."""
    intr = cfg.intr
    rcfg = cfg.render
    lrs = map_lr_tree(cfg.opt)
    bg = jnp.asarray(rcfg.bg_color, jnp.float32)
    fx, fy = intr.fx, intr.fy
    rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0
    n_dev = mesh.devices.size

    # the auto (None) pallas switch keys off the DEFAULT backend; this
    # step runs on the mesh's devices, which may be a CPU test mesh even
    # when a TPU backend is registered — decide from the mesh instead
    mesh_is_tpu = mesh.devices.flat[0].platform == "tpu"
    raster = partial(
        rasterize_tiled, sh_degree=cfg.map.sh_degree, width=intr.width,
        height=intr.height, tile=rcfg.tile_size,
        visible_cap=rcfg.visible_capacity, tile_span=rcfg.tile_span,
        tile_cap=rcfg.max_per_tile, chunk=rcfg.composite_chunk, want_used=False,
        use_pallas=mesh_is_tpu)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    param_sh = {k: shard for k in
                ("xyz", "f_dc", "f_rest", "log_scaling", "rotation",
                 "opacity_logit")}
    adam_sh = AdamState(m=param_sh, v=dict(param_sh), step=repl)
    batch_sh = NamedSharding(mesh, P(axis))  # batch axis across devices

    def _sh(params):
        return jnp.concatenate(
            [params["f_dc"][:, None, :], params["f_rest"]], axis=1)

    @partial(jax.jit,
             in_shardings=(param_sh, adam_sh, shard, batch_sh, batch_sh,
                           batch_sh),
             out_shardings=(param_sh, adam_sh, repl),
             donate_argnums=(0, 1))
    def step(params, adam, live, w2c_b, rgb_b, depth_b):
        def render_loss(p, w2c, rgb_u8, depth_raw):
            # rgb_u8 is channel-first (3, H, W): TPU lane-padding rule
            gt_img = rgb_u8.astype(jnp.float32) / 255.0
            gt_depth = depth_raw / intr.depth_scale
            out = raster(p["xyz"], p["rotation"], jnp.exp(p["log_scaling"]),
                         jax.nn.sigmoid(p["opacity_logit"][:, 0]),
                         _sh(p), w2c, live, bg, fx, fy, rcx, rcy)
            loss, _ = mapping_loss(out.color, out.depth, gt_img, gt_depth,
                                   lambda_dssim=cfg.opt.lambda_dssim,
                                   depth_weight=cfg.opt.depth_loss_weight,
                                   d_max=cfg.opt.depth_d_max)
            return loss

        def total_loss(p):
            losses = jax.vmap(lambda w, r, d: render_loss(p, w, r, d))(
                w2c_b, rgb_b, depth_b)
            # mean over the keyframe batch: one parallel step ~ n_dev
            # reference-mapper iterations at 1/n_dev the per-view LR weight
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(total_loss)(params)
        params, adam = adam_step(params, grads, adam, lrs, live,
                                 b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                                 eps=cfg.opt.adam_eps)
        return params, adam, loss

    return ParallelMappingStep(step=step, mesh=mesh, batch=n_dev)
