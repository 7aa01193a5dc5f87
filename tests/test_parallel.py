"""Multi-chip mapping: sharded step correctness + integrated engine.

Runs on the 8-virtual-CPU-device mesh from conftest.py.  Covers:
  * numerical equivalence of the FSDP+DP sharded mapping step vs the same
    batched update computed on one device (VERDICT r1 item 2),
  * the sharded FusedEngine end-to-end on the synthetic scene at the same
    quality thresholds as the single-device engine,
  * mesh-size sweep (1/2/4/8) executing the sharded step.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.models import adam_init, add_gaussians, empty_map, map_params
from gs_icp_slam_tpu.parallel import make_mesh, place_state, state_shardings
from gs_icp_slam_tpu.slam.fused import make_mapping_primitives
from gs_icp_slam_tpu.utils.camera import Intrinsics


def _tiny_cfg(n_dev: int, cap: int = 1024):
    width, height = 64, 48
    intr = Intrinsics(width=width, height=height, fx=60.0, fy=60.0,
                      cx=(width - 1) / 2, cy=(height - 1) / 2,
                      depth_scale=1000.0, depth_trunc=8.0)
    return synthetic_config(intr, capacity=cap, target_capacity=256,
                            visible_capacity=256)


def _populated_map(cfg, n_pts=400, seed=0):
    rng = np.random.default_rng(seed)
    cap = cfg.map.capacity
    gmap = empty_map(cap, cfg.map.sh_degree)
    gmap = add_gaussians(
        gmap,
        jnp.asarray(np.stack([rng.uniform(-1, 1, n_pts),
                              rng.uniform(-0.7, 0.7, n_pts),
                              rng.uniform(1, 3, n_pts)], -1)
                    .astype(np.float32)),
        jnp.asarray(rng.uniform(size=(n_pts, 3)).astype(np.float32)),
        jnp.asarray(np.tile(np.array([0, 0, 0, 1], np.float32),
                            (n_pts, 1))),
        jnp.asarray(rng.uniform(0.02, 0.08, (n_pts, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(1, 3, n_pts).astype(np.float32)),
        jnp.ones((n_pts,), bool), jnp.ones((n_pts,), bool))
    return gmap


def _keyframe_batch(cfg, b, seed=1):
    rng = np.random.default_rng(seed)
    h, w = cfg.intr.height, cfg.intr.width
    w2c_b = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    rgb_b = jnp.asarray(rng.integers(0, 255, (b, 3, h, w)), jnp.uint8)
    depth_b = jnp.asarray(
        rng.uniform(500, 3000, (b, h, w)).astype(np.float32))
    return w2c_b, rgb_b, depth_b


@pytest.mark.parametrize("mode", ["dp", "fsdp"])
def test_sharded_step_matches_single_device(mode):
    """Both multi-chip modes (replicated-map DP and capacity-sharded
    FSDP) must produce the SAME update as the equivalent batched
    mean-loss step on one device."""
    devices = jax.devices("cpu")
    mesh = make_mesh(devices)
    n_dev = len(devices)
    cfg = _tiny_cfg(n_dev)
    cfg = cfg.replace(engine=dataclasses.replace(cfg.engine,
                                                 parallel_mode=mode))
    gmap = _populated_map(cfg)
    params = map_params(gmap)
    adam = adam_init(params)
    w2c_b, rgb_b, depth_b = _keyframe_batch(cfg, n_dev)

    prim_s = make_mapping_primitives(cfg, mesh)
    prim_1 = make_mapping_primitives(cfg, None)

    # single-device reference: mean loss over the same batch, one Adam step
    from gs_icp_slam_tpu.models import adam_step, map_lr_tree
    lrs = map_lr_tree(cfg.opt)

    @jax.jit
    def reference(params, adam, live, w2c_b, rgb_b, depth_b):
        def loss_fn(p):
            losses, stats = jax.vmap(
                lambda w, r, d: prim_1.opt_loss(p, live, w, r, d))(
                w2c_b, rgb_b, depth_b)
            return jnp.mean(losses), stats
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, adam = adam_step(params, grads, adam, lrs, live,
                                 b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                                 eps=cfg.opt.adam_eps)
        return params, adam, loss

    p_ref, a_ref, loss_ref = reference(params, adam, gmap.live, w2c_b,
                                       rgb_b, depth_b)

    sharded_step = jax.jit(prim_s.opt_step_batched)
    p_sh, a_sh, loss_sh, _ = sharded_step(params, adam, gmap.live, w2c_b,
                                          rgb_b, depth_b)

    assert np.isfinite(float(loss_sh))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_sh[k]), np.asarray(p_ref[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"param {k} diverges between sharded and single-device")
        np.testing.assert_allclose(
            np.asarray(a_sh.m[k]), np.asarray(a_ref.m[k]), rtol=2e-4,
            atol=1e-7, err_msg=f"adam.m {k}")


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_step_mesh_sizes(n_dev):
    """The sharded step compiles and runs at every mesh size that divides
    the capacity (scaling-harness smoke; timings in scripts/bench_scaling)."""
    devices = jax.devices("cpu")[:n_dev]
    mesh = make_mesh(devices)
    cfg = _tiny_cfg(n_dev)
    gmap = _populated_map(cfg)
    params = map_params(gmap)
    adam = adam_init(params)
    w2c_b, rgb_b, depth_b = _keyframe_batch(cfg, n_dev)
    prim = make_mapping_primitives(cfg, mesh)
    p, a, loss, stats = jax.jit(prim.opt_step_batched)(
        params, adam, gmap.live, w2c_b, rgb_b, depth_b)
    assert np.isfinite(float(loss))
    assert int(a.step) == 1


def test_sharded_engine_end_to_end():
    """FusedEngine(mesh=...) matches the single-device quality thresholds
    (test_fused.py) on the synthetic sequence."""
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine

    mesh = make_mesh(jax.devices("cpu"))
    seq = open_dataset("synthetic", width=96, height=72, num_frames=10)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 13,
                           target_capacity=1 << 11, visible_capacity=1 << 11)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=2, mapping_iters_final=64,
        keyframe_capacity=16))
    eng = FusedEngine(seq, cfg, mesh=mesh)
    res = eng.run(eval_render=True, eval_stride=4)
    # each sharded iteration optimizes 8 keyframes, so this small budget
    # does more mapping work than the single-device test's 3/frame + 100
    assert res.ate_rmse is not None and res.ate_rmse < 0.005, res.ate_rmse
    assert res.psnr is not None and res.psnr > 22.0, res.psnr


_SHAPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "u8": 1, "s8": 1, "f64": 8}


def _collective_shapes(hlo_text):
    """Parse the optimized HLO for collective ops -> {op: [(dtype, nelems)]}.

    Handles both plain and tuple result types and async -start variants."""
    import re

    out = {}
    for m in re.finditer(
            r"= (\([^)]*\)|\S+?) (all-reduce|all-gather|reduce-scatter|"
            r"collective-permute|all-to-all)(?:-start)?\(", hlo_text):
        shapes = re.findall(r"(\w+)\[([\d,]*)\]", m.group(1))
        parsed = []
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            parsed.append((dt, n))
        out.setdefault(m.group(2), []).append(parsed)
    return out


def _coll_bytes(entries, exclude_scalar=False):
    tot = 0
    for op in entries:
        for dt, n in op:
            if exclude_scalar and n <= 4:
                continue
            tot += _SHAPE_BYTES[dt] * n
    return tot


@pytest.mark.quick
def test_collective_audit():
    """Machine-check the multi-chip comm claims (VERDICT r3 #4) against the
    COMPILED HLO, so the scaling story survives refactors:

      dp   — the map is replicated; the ONLY array-sized collective is the
             grad all-reduce, whose float bytes equal the param bytes
             (plus the 4-byte loss).  No all-gather, no reduce-scatter,
             no permutes: zero O(capacity) param movement per iteration.
      fsdp — params+live all-gather in (param bytes + live bytes), grads
             reduce-scatter out (param bytes / n_dev per-shard output),
             and all-reduces carry only scalars (loss + stats).

    Also pins the ring-all-reduce byte model SCALING.json's
    comm_bytes_per_device_per_iter table is derived from."""
    devices = jax.devices("cpu")
    n_dev = len(devices)
    mesh = make_mesh(devices)
    hlo = {}
    for mode in ("dp", "fsdp"):
        cfg = _tiny_cfg(n_dev)
        cfg = cfg.replace(engine=dataclasses.replace(cfg.engine,
                                                     parallel_mode=mode))
        gmap = _populated_map(cfg)
        params = map_params(gmap)
        adam = adam_init(params)
        w2c_b, rgb_b, depth_b = _keyframe_batch(cfg, n_dev)
        prim = make_mapping_primitives(cfg, mesh)
        txt = jax.jit(prim.opt_step_batched).lower(
            params, adam, gmap.live, w2c_b, rgb_b, depth_b
        ).compile().as_text()
        hlo[mode] = _collective_shapes(txt)
        param_bytes = sum(np.asarray(v).nbytes for v in params.values())

    # --- dp: exactly one grad-sized all-reduce, nothing else array-sized
    dp = hlo["dp"]
    assert "all-gather" not in dp, dp.keys()
    assert "reduce-scatter" not in dp, dp.keys()
    assert "collective-permute" not in dp and "all-to-all" not in dp
    ar_bytes = _coll_bytes(dp["all-reduce"], exclude_scalar=True)
    assert ar_bytes == param_bytes, (ar_bytes, param_bytes)

    # --- fsdp: all-gather = params + live mask; reduce-scatter = one
    # shard of the grads per param; all-reduce = scalars only
    fs = hlo["fsdp"]
    live_bytes = _tiny_cfg(n_dev).map.capacity  # pred[capacity]
    ag_bytes = _coll_bytes(fs["all-gather"])
    assert ag_bytes == param_bytes + live_bytes, (
        ag_bytes, param_bytes, live_bytes)
    rs_bytes = _coll_bytes(fs["reduce-scatter"])
    assert rs_bytes == param_bytes // n_dev, (rs_bytes, param_bytes, n_dev)
    assert _coll_bytes(fs["all-reduce"], exclude_scalar=True) == 0, (
        "fsdp all-reduces must carry only scalars", fs["all-reduce"])
    assert "collective-permute" not in fs and "all-to-all" not in fs

    # --- the byte model behind SCALING.json's comm table: ring all-reduce
    # moves 2(n-1)/n * param_bytes per device per iteration
    import json
    import os
    scaling_path = os.path.join(os.path.dirname(__file__), "..",
                                "SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        pb = sc["param_bytes"]
        for n_s, bytes_claimed in sc[
                "comm_bytes_per_device_per_iter"].items():
            n_i = int(n_s)
            assert bytes_claimed == 2 * (n_i - 1) * pb // n_i, (
                n_s, bytes_claimed)


def test_state_shardings_layout():
    mesh = make_mesh(jax.devices("cpu"))
    from gs_icp_slam_tpu.slam.state import init_state

    cfg = _tiny_cfg(8)
    st = init_state(cfg, 4, np.eye(4, dtype=np.float32))
    st = place_state(st, mesh)
    # map params sharded along capacity; scalars and target replicated
    assert not st.gmap.xyz.sharding.is_fully_replicated
    assert st.gmap.n.sharding.is_fully_replicated
    assert st.target.points.sharding.is_fully_replicated
    assert st.kf_rgb.sharding.is_fully_replicated


@pytest.mark.quick
def test_collective_audit_integrated_step():
    """Audit the FULL mesh-mode fused step's compiled HLO, not just the
    mapping sub-step (VERDICT r4 weak #3): tracking (1-NN, G-ICP loop),
    gaussian insertion, target export, and keyframe bookkeeping all run
    under GSPMD with `in_shardings`, which is free to insert O(capacity)
    collectives on any refactor — and nothing would fail (a dryrun
    catches hangs, not silent 10x comm regressions).

    dp mode: array-sized collective traffic must be EXACTLY the mapping
    iterations' grad all-reduces (param bytes each); everything else
    (conversion of partials, overlap ratios, counters) may only move
    scalars.  No all-gather / reduce-scatter / permute / all-to-all."""
    from gs_icp_slam_tpu.slam.fused import make_fused_step
    from gs_icp_slam_tpu.slam.state import init_state
    from gs_icp_slam_tpu.utils.pointcloud import make_downsample_filter

    devices = jax.devices("cpu")
    mesh = make_mesh(devices)
    cfg = _tiny_cfg(len(devices))
    iters = 2
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=iters, keyframe_capacity=4,
        parallel_mode="dp"))
    intr = cfg.intr
    filt = make_downsample_filter(intr.width, intr.height, intr.fx,
                                  intr.fy, intr.cx, intr.cy,
                                  cfg.downsample_rate)
    fused = make_fused_step(cfg, filt, mesh=mesh)
    state = place_state(init_state(cfg, 4, np.eye(4, dtype=np.float32)),
                        mesh, mode="dp")
    depth = jnp.zeros((intr.height, intr.width), jnp.float32)
    rgb = jnp.zeros((3, intr.height, intr.width), jnp.uint8)
    txt = fused.step.lower(state, depth, rgb, jnp.bool_(False),
                           None, None).compile().as_text()
    coll = _collective_shapes(txt)

    assert "all-gather" not in coll, coll.keys()
    assert "reduce-scatter" not in coll, coll.keys()
    assert "collective-permute" not in coll and "all-to-all" not in coll
    params = map_params(_populated_map(cfg))
    param_bytes = sum(np.asarray(v).nbytes for v in params.values())
    ar_bytes = _coll_bytes(coll.get("all-reduce", []), exclude_scalar=True)
    assert ar_bytes == iters * param_bytes, (
        "tracking path introduced array-sized collectives beyond the "
        f"{iters} grad all-reduces", ar_bytes, iters * param_bytes)
