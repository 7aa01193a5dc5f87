"""Mapping-throughput scaling over a device mesh -> SCALING.json.

Measures the sharded FSDP+DP mapping step (slam/fused.make_mapping_primitives
with a mesh) at mesh sizes 1/2/4/8: each device optimizes its own keyframe
against the capacity-sharded map, so one step performs `n` reference-mapper
iterations (mp_Mapper.py:196-248) of work.  Reported metric: keyframe
iterations per second vs mesh size, efficiency relative to 1 device.

On this environment the mesh is 8 VIRTUAL CPU devices on one host
(xla_force_host_platform_device_count): XLA runs the per-device programs on
separate host threads, so scaling is real but bounded by host cores and
shared memory bandwidth — the number to beat on a TPU pod slice is the ICI
all-gather/psum-scatter overhead instead.  Run on real hardware when >1
chip is available; the harness is hardware-agnostic.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_scaling.py [--out SCALING.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--capacity", type=int, default=1 << 15)
    ap.add_argument("--points", type=int, default=12000)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--mode", default="auto",
                    choices=("auto", "dp", "fsdp"))
    args = ap.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        jax.config.update("jax_platform_name", "cpu")

    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.models import adam_init, add_gaussians, empty_map, \
        map_params
    from gs_icp_slam_tpu.parallel import make_mesh
    from gs_icp_slam_tpu.slam.fused import make_mapping_primitives
    from gs_icp_slam_tpu.utils.camera import Intrinsics

    intr = Intrinsics(width=args.width, height=args.height, fx=300.0,
                      fy=300.0, cx=(args.width - 1) / 2,
                      cy=(args.height - 1) / 2, depth_scale=1000.0,
                      depth_trunc=8.0)
    cfg = synthetic_config(intr, capacity=args.capacity,
                           target_capacity=1 << 12,
                           visible_capacity=1 << 13)
    import dataclasses as _dc
    cfg = cfg.replace(engine=_dc.replace(cfg.engine,
                                         parallel_mode=args.mode))
    from gs_icp_slam_tpu.parallel.sharded import choose_mode
    mode = choose_mode(args.capacity, cfg.map.sh_degree, args.mode)
    print("parallel mode:", mode, flush=True)

    rng = np.random.default_rng(0)
    p = args.points
    gmap = empty_map(args.capacity, cfg.map.sh_degree)
    gmap = add_gaussians(
        gmap,
        jnp.asarray(np.stack([rng.uniform(-2, 2, p), rng.uniform(-1.5, 1.5, p),
                              rng.uniform(0.8, 5, p)], -1).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(p, 3)).astype(np.float32)),
        jnp.asarray(np.tile(np.array([0, 0, 0, 1], np.float32), (p, 1))),
        jnp.asarray(rng.uniform(0.01, 0.05, (p, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(1, 4, p).astype(np.float32)),
        jnp.ones((p,), bool), jnp.ones((p,), bool))
    params0 = map_params(gmap)
    adam0 = adam_init(params0)

    devices_all = jax.devices(args.platform)
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devices_all)
             and args.capacity % n == 0]
    rows = []
    for n in sizes:
        mesh = make_mesh(devices_all[:n])
        prim = make_mapping_primitives(cfg, mesh)
        step = jax.jit(prim.opt_step_batched)

        w2c_b = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
        rgb_b = jnp.asarray(rng.integers(0, 255,
                                         (n, 3, args.height, args.width)),
                            jnp.uint8)
        depth_b = jnp.asarray(rng.uniform(
            500, 3000, (n, args.height, args.width)).astype(np.float32))

        params, adam = params0, adam0
        for _ in range(3):  # warmup/compile
            params, adam, loss, _ = step(params, adam, gmap.live, w2c_b,
                                         rgb_b, depth_b)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            params, adam, loss, _ = step(params, adam, gmap.live, w2c_b,
                                         rgb_b, depth_b)
        float(loss)
        dt = (time.perf_counter() - t0) / args.reps
        rows.append(dict(mesh=n, step_ms=round(dt * 1000, 3),
                         kf_iters_per_s=round(n / dt, 3)))
        print(rows[-1], flush=True)

    base = rows[0]["kf_iters_per_s"]
    ncores = os.cpu_count()
    for r in rows:
        # wall efficiency: meaningful on real chips (each device = its own
        # compute); on a virtual CPU mesh the N per-device programs share
        # `ncores` host cores, so it is bounded by ~ncores/(N*threads) and
        # measures the HOST, not the sharding design
        r["wall_efficiency"] = round(
            r["kf_iters_per_s"] / (base * r["mesh"]), 4)
        # host-normalized throughput: total kf-iters/s vs 1-device.  On a
        # core-saturated host every zero-overhead design is FLAT (~1.0);
        # a value well below 1.0 would expose real collective/copy
        # overhead growing with mesh size.  This is the CPU-proxy signal.
        r["host_norm_throughput"] = round(r["kf_iters_per_s"] / base, 4)

    # analytic per-device comm volume per iteration (the quantity that
    # rides ICI on real hardware)
    from gs_icp_slam_tpu.parallel.sharded import _map_bytes
    pbytes = _map_bytes(args.capacity, cfg.map.sh_degree) // 3  # params
    comm = {}
    for n in sizes[1:]:
        if mode == "dp":
            # one grad all-reduce (ring): 2*(n-1)/n * P bytes per device
            comm[str(n)] = int(2 * (n - 1) / n * pbytes)
        else:
            # all-gather params in + psum-scatter grads out
            comm[str(n)] = int(2 * (n - 1) / n * pbytes)

    out = dict(
        metric="sharded_mapping_scaling",
        mode=mode,
        platform=str(devices_all[0].platform),
        host_cores=ncores,
        virtual_cpu_mesh=(
            f"proxy for a pod slice on {ncores} shared host cores: one "
            "render already saturates them, so wall_efficiency measures "
            "host contention, not the design; host_norm_throughput ~1.0 "
            "= zero sharding overhead (collectives/copies add nothing); "
            "ICI costs absent" if args.platform == "cpu" else None),
        image=f"{args.width}x{args.height}",
        capacity=args.capacity, live_points=args.points,
        param_bytes=pbytes,
        comm_bytes_per_device_per_iter=comm,
        rows=rows)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
