"""Break the NEW rasterize_tiled forward into stages and time each on TPU.

Pipeline (ops/rasterize.py): project -> depth sort over N -> pair build
(D*D, V) -> composite-key sort -> searchsorted ranges -> composed gather
-> Pallas composite.  Run after any pipeline change to keep the cost
model current.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from gs_icp_slam_tpu.ops.projection import (project_gaussians_packed,
                                                tile_rect)

    # bench-like geometry
    width, height, tile = 1200, 680, 16
    ntx, nty = -(-width // tile), -(-height // tile)
    T = ntx * nty
    N = 1 << 18          # capacity
    V = 1 << 16          # visible cap
    D, K = 3, 256
    NLIVE = 60000        # a mid-run live map (bigger than bench's 16k)

    rng = np.random.default_rng(0)
    xyz = np.concatenate([
        np.stack([rng.uniform(-3, 3, NLIVE), rng.uniform(-2, 2, NLIVE),
                  rng.uniform(0.5, 6, NLIVE)], -1),
        np.zeros((N - NLIVE, 3))]).astype(np.float32)
    quat = rng.normal(size=(N, 4)).astype(np.float32)
    scale = rng.uniform(0.005, 0.03, (N, 3)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.9, N).astype(np.float32)
    sh = rng.uniform(-0.5, 0.5, (N, 1, 3)).astype(np.float32)
    live = np.zeros((N,), bool)
    live[:NLIVE] = True
    w2c = np.eye(4, dtype=np.float32)
    args = tuple(map(jnp.asarray, (xyz, quat, scale, opacity, sh, live)))
    w2c = jnp.asarray(w2c)
    fx = fy = 600.0
    cx, cy = (width - 1) / 2, (height - 1) / 2

    @jax.jit
    def stage_project(xyz, quat, scale, opacity, sh, live):
        return project_gaussians_packed(xyz, quat, scale, opacity, sh, 0,
                                        w2c, fx, fy, cx, cy, width, height,
                                        live)

    attr, radius_i, visible = stage_project(*args)
    print("visible:", int(jnp.sum(visible)))

    @jax.jit
    def stage_depthsort_n(attr, visible):
        vcount = jnp.sum(visible.astype(jnp.int32))
        depth_key = jnp.where(visible, attr[9], jnp.inf)
        _, order_full = jax.lax.sort(
            (depth_key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        vis_order = order_full[:V]
        vslot = jnp.arange(V, dtype=jnp.int32)
        vok = vslot < jnp.minimum(vcount, V)
        return vis_order, vok, vcount

    vis_order, vok, vcount = stage_depthsort_n(attr, visible)

    @jax.jit
    def stage_pairs(attr, radius_i, vis_order, vok):
        mx = attr[0, vis_order]
        my = attr[1, vis_order]
        radius = jnp.where(vok, radius_i[vis_order], 0).astype(jnp.float32)
        tx0, ty0, tx1, ty1 = tile_rect(mx, my, radius, ntx, nty, tile, D)
        dd = jnp.arange(D * D, dtype=jnp.float32)
        gx = tx0[None, :] + (dd % D)[:, None]
        gy = ty0[None, :] + (dd // D)[:, None]
        pair_ok = (gx <= tx1[None, :]) & (gy <= ty1[None, :]) & vok[None, :]
        pair_tile = (gy * ntx + gx).astype(jnp.int32)
        S = max(V - 1, 1).bit_length()
        SENTINEL = jnp.int32(2 ** 31 - 1)
        vslot = jnp.arange(V, dtype=jnp.int32)
        keys = jnp.where(pair_ok, (pair_tile << S) | vslot[None, :],
                         SENTINEL).reshape(-1)
        return keys, jnp.sum(pair_ok)

    keys, n_pairs = stage_pairs(attr, jnp.asarray(radius_i), vis_order, vok)
    print("real pairs:", int(n_pairs))
    S = max(V - 1, 1).bit_length()

    @jax.jit
    def stage_sort_pairs(keys):
        return jax.lax.sort(keys)

    key_s = stage_sort_pairs(keys)

    @jax.jit
    def stage_ranges(key_s):
        start = jnp.searchsorted(
            key_s, (jnp.arange(T + 1, dtype=jnp.int32) << S),
            method="scan_unrolled").astype(jnp.int32)
        run = start[1:] - start[:-1]
        counts = jnp.minimum(run, K)
        start = start[:-1]
        gpos = jnp.minimum(
            start[:, None] + jnp.arange(K, dtype=jnp.int32)[None],
            key_s.shape[0] - 1)
        hit = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
        tile_list = jnp.where(hit, key_s[gpos] & ((1 << S) - 1), V)
        return counts, tile_list

    counts, tile_list = stage_ranges(key_s)
    print("tile occupancy: total", int(jnp.sum(counts)),
          "max", int(jnp.max(counts)))

    @jax.jit
    def stage_gather_tiles(attr, vis_order, tile_list):
        vis_order_p = jnp.concatenate(
            [vis_order, jnp.full((1,), N, jnp.int32)])
        full_list = vis_order_p[tile_list]
        attr_p = jnp.pad(attr, ((0, 0), (0, 1)))
        attrs = attr_p[:, full_list]
        attrs = jnp.swapaxes(attrs, 0, 1)
        return attrs

    attrs = stage_gather_tiles(attr, vis_order, tile_list)

    from gs_icp_slam_tpu.ops.composite_pallas import make_composite_dyn

    comp = make_composite_dyn(T, ntx, tile, K)

    @jax.jit
    def stage_composite(counts, attrs):
        attrs16 = jnp.pad(attrs, ((0, 0), (0, 6), (0, 0)))
        return comp(counts, attrs16)

    out8 = stage_composite(counts, attrs)

    @jax.jit
    def stage_composite_grad(counts, attrs):
        def f(a):
            attrs16 = jnp.pad(a, ((0, 0), (0, 6), (0, 0)))
            return jnp.sum(comp(counts, attrs16) ** 2)
        return jax.value_and_grad(f)(attrs)

    stage_composite_grad(counts, attrs)

    stages = {
        "project (N=256k)": lambda: stage_project(*args),
        "depth sort over N": lambda: stage_depthsort_n(attr, visible),
        "build pairs (9*64k)": lambda: stage_pairs(
            attr, jnp.asarray(radius_i), vis_order, vok),
        "sort pair keys": lambda: stage_sort_pairs(keys),
        "ranges+tile_list": lambda: stage_ranges(key_s),
        "gather tiles (10,T,K)": lambda: stage_gather_tiles(
            attr, vis_order, tile_list),
        "composite dyn fwd": lambda: stage_composite(counts, attrs),
        "composite dyn fwd+bwd": lambda: stage_composite_grad(counts, attrs),
    }
    total = 0.0
    for name, fn in stages.items():
        ms = timeit(fn)
        if "bwd" not in name:
            total += ms
        print(f"{name:28s} {ms:8.2f} ms")
    print(f"{'SUM fwd':28s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
