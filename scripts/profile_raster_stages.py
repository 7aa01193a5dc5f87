"""Slope-timed decomposition of the pair-window rasterizer at bench load.

Stages nest (each includes the previous), so per-stage cost = difference:
  A project | B +depth sort | C +pairs+sort+ranges+payload | D full fwd
  E fwd+bwd (value_and_grad)
Also: the fused step wall with mapping_iters 0 vs 2 isolates the
tracking+insert+overhead share of the frame.
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

from gs_icp_slam_tpu.utils.profiling import slope_time  # noqa: E402


def main():
    from gs_icp_slam_tpu.ops.projection import (project_gaussians_packed,
                                                tile_rect)
    from gs_icp_slam_tpu.ops.rasterize import rasterize_tiled

    width, height = 1200, 680
    tile = 32
    D = int(os.environ.get("D", "2"))     # production tile_span
    K = int(os.environ.get("K", "384"))   # production pairs-per-tile cap
    ntx, nty = -(-width // tile), -(-height // tile)
    T = ntx * nty
    N = 1 << 16          # bucket at bench load
    V = 1 << 16
    NLIVE = 50000

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
    args = tuple(map(jnp.asarray, (xyz, quat, scale, opacity, sh, live)))
    w2c = jnp.eye(4)
    bg = jnp.zeros((3,))
    fx = fy = 600.0
    cx, cy = (width - 1) / 2, (height - 1) / 2

    def stage_a(s):
        return project_gaussians_packed(
            args[0] + s, args[1], args[2], args[3], args[4], 0, w2c,
            fx, fy, cx, cy, width, height, args[5])

    def through_sort(s):
        attr, radius_i, visible = project_gaussians_packed(
            args[0] + s, args[1], args[2], args[3], args[4], 0, w2c,
            fx, fy, cx, cy, width, height, args[5])
        depth_key = jnp.where(visible, attr[9], jnp.inf)
        _, order = jax.lax.sort(
            (depth_key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return order[:V]

    def through_payload(s):
        attr, radius_i, visible = project_gaussians_packed(
            args[0] + s, args[1], args[2], args[3], args[4], 0, w2c,
            fx, fy, cx, cy, width, height, args[5])
        depth_key = jnp.where(visible, attr[9], jnp.inf)
        vcount = jnp.sum(visible.astype(jnp.int32))
        _, order = jax.lax.sort(
            (depth_key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        vis_order = order[:V]
        vslot = jnp.arange(V, dtype=jnp.int32)
        vok = vslot < jnp.minimum(vcount, V)
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
        keys = jnp.where(pair_ok, (pair_tile << S) | vslot[None, :],
                         jnp.int32(2 ** 31 - 1)).reshape(-1)
        key_s = jax.lax.sort(keys)
        start = jnp.searchsorted(
            key_s, (jnp.arange(T + 1, dtype=jnp.int32) << S),
            method="scan_unrolled").astype(jnp.int32)
        pair_slot = jnp.minimum(key_s & ((1 << S) - 1), V)
        vis_order_p = jnp.concatenate(
            [vis_order, jnp.full((1,), N, jnp.int32)])
        attr_p = jnp.pad(attr, ((0, 0), (0, 1)))
        attr_v16 = jnp.pad(attr_p[:, vis_order_p], ((0, 6), (0, 0)))
        payload = jnp.pad(attr_v16[:, jnp.concatenate(
            [pair_slot, jnp.full((K,), V, jnp.int32)])].T,
            ((0, 0), (0, 112)))
        return payload, start

    def full_fwd(s):
        out = rasterize_tiled(
            args[0] + s, args[1], args[2], args[3], args[4], w2c, args[5],
            bg, fx, fy, cx, cy, sh_degree=0, width=width, height=height,
            tile=tile, tile_span=D, tile_cap=K, visible_cap=V,
            want_used=False, use_pallas=True)
        return out.color

    def fwd_bwd(s):
        def loss(x):
            out = rasterize_tiled(
                x, args[1], args[2], args[3], args[4], w2c, args[5],
                bg, fx, fy, cx, cy, sh_degree=0, width=width,
                height=height, tile=tile, tile_span=D, tile_cap=K,
                visible_cap=V, want_used=False, use_pallas=True)
            return jnp.sum(out.color ** 2)
        return jax.value_and_grad(loss)(args[0] + s)

    # F: composite custom-VJP alone (kernel bwd + cell gather), cutting
    # the graph at attr_v16 — E - D - F = projection/compaction backward
    from gs_icp_slam_tpu.ops.composite_pallas import make_composite_win

    @jax.jit
    def _binning(s):
        attr, radius_i, visible = project_gaussians_packed(
            args[0] + s, args[1], args[2], args[3], args[4], 0, w2c,
            fx, fy, cx, cy, width, height, args[5])
        depth_key = jnp.where(visible, attr[9], jnp.inf)
        _, order_full = jax.lax.sort(
            (depth_key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        vis_order = order_full[:V]
        vslot = jnp.arange(V, dtype=jnp.int32)
        vok = vslot < jnp.minimum(jnp.sum(visible.astype(jnp.int32)), V)
        mx = attr[0, vis_order]
        my = attr[1, vis_order]
        radius = jnp.where(vok, radius_i[vis_order], 0).astype(jnp.float32)
        tx0, ty0, tx1, ty1 = tile_rect(mx, my, radius, ntx, nty, tile, D)
        dd = jnp.arange(D * D, dtype=jnp.float32)
        gx = tx0[None, :] + (dd % D)[:, None]
        gy = ty0[None, :] + (dd // D)[:, None]
        pair_ok = (gx <= tx1[None, :]) & (gy <= ty1[None, :]) & vok[None, :]
        pair_tile = (gy * ntx + gx).astype(jnp.int32)
        S_ = max(V - 1, 1).bit_length()
        SENT = jnp.int32(2 ** 31 - 1)
        keys = jnp.where(pair_ok, (pair_tile << S_) | vslot[None, :],
                         SENT).reshape(-1)
        pid = jnp.arange(keys.shape[0], dtype=jnp.int32)
        key_s, pid_s = jax.lax.sort((keys, pid), num_keys=1)
        start = jnp.searchsorted(
            key_s, (jnp.arange(T + 1, dtype=jnp.int32) << S_),
            method="scan_unrolled").astype(jnp.int32)
        run = start[1:] - start[:-1]
        counts = jnp.minimum(run, K)
        start = start[:-1]
        pair_slot = jnp.minimum(key_s & ((1 << S_) - 1), V)
        pair_slot = jnp.concatenate(
            [pair_slot, jnp.full((K,), V, jnp.int32)])
        rr = jnp.arange(key_s.shape[0], dtype=jnp.int32)
        t_of_r = jnp.clip(key_s >> S_, 0, T - 1)
        k_of_r = rr - start[t_of_r]
        cell_of_r = jnp.where((key_s != SENT) & (k_of_r < K),
                              t_of_r * K + k_of_r, T * K)
        cell_idx = jnp.zeros_like(rr).at[pid_s].set(
            cell_of_r).reshape(D * D, V)
        vis_order_p = jnp.concatenate(
            [vis_order, jnp.full((1,), N, jnp.int32)])
        attr_p = jnp.pad(attr, ((0, 0), (0, 1)))
        attr_v16 = jnp.pad(attr_p[:, vis_order_p], ((0, 6), (0, 0)))
        return counts, start, pair_slot, cell_idx, attr_v16

    counts_c, start_c, pslot_c, cidx_c, attrv_c = _binning(0.0)
    comp = make_composite_win(T, ntx, tile, K)
    gout = jnp.ones((T, 8, tile * tile), jnp.float32)

    def comp_vjp_only(s):
        def f(a):
            return jnp.sum(comp(counts_c, start_c, pslot_c, cidx_c,
                                a) * gout)
        return jax.grad(f)(attrv_c + s)

    stages = {
        "A project": stage_a,
        "B +depth sort": through_sort,
        "C +pairs/sort/ranges/payload": through_payload,
        "D full fwd": full_fwd,
        "F composite vjp only": comp_vjp_only,
        "E fwd+bwd": fwd_bwd,
    }
    prev = 0.0
    for name, fn in stages.items():
        ms = slope_time(fn, R=8)
        print(f"{name:30s} {ms:8.2f} ms (+{ms - prev:6.2f})", flush=True)
        if name != "D full fwd":
            prev = ms


if __name__ == "__main__":
    main()
