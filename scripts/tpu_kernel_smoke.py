"""Compile-and-run smoke of every production Pallas kernel, NON-interpreted.

Round-2 postmortem: all kernel tests ran interpret=True on CPU, which skips
Mosaic lowering entirely — an illegal BlockSpec shipped to HEAD and the
driver bench was the first thing to touch the real lowering (VERDICT r2
missing #1).  This script exercises the exact kernels the production path
uses, at bench geometry AND at the small-scene geometry the quality tests
use, on whatever real backend is present (TPU).  Exit 0 = all kernels
lower, compile, execute, and their outputs are finite.

Run:  python scripts/tpu_kernel_smoke.py        (~60 s incl. compiles)
Wired into .claude/skills/verify — must be green before any snapshot.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _check(name, *arrays):
    for i, a in enumerate(arrays):
        a = np.asarray(jax.device_get(a))
        assert np.isfinite(a).all(), f"{name}: output {i} has non-finite"
    print(f"  ok: {name}")


def smoke_composite_win(T, ntx, tile_px, K, V):
    from gs_icp_slam_tpu.ops.composite_pallas import (build_cell_idx_np,
                                                      make_composite_win)
    name = f"composite_win T={T} tile={tile_px} K={K}"
    P = tile_px * tile_px
    rng = np.random.default_rng(0)
    counts_np = rng.integers(0, K + 1, size=(T,)).astype(np.int32)
    starts_np = (np.cumsum(counts_np) - counts_np).astype(np.int32)
    # window DMA reads the aligned win_span(K) window: pad past the last
    # run, exactly as rasterize_tiled does
    from gs_icp_slam_tpu.ops.composite_pallas import win_span
    Np = int(counts_np.sum()) + win_span(K)
    counts = jnp.asarray(counts_np)
    starts = jnp.asarray(starts_np)
    pair_slot = jnp.asarray(rng.integers(0, V, size=(Np,)).astype(np.int32))
    attr = np.zeros((16, V + 1), np.float32)
    attr[0] = rng.uniform(0, ntx * tile_px, V + 1)
    attr[1] = rng.uniform(0, (T // ntx) * tile_px, V + 1)
    attr[2] = 0.05
    attr[4] = 0.05
    attr[5:8] = rng.uniform(0, 1, (3, V + 1))
    attr[8] = rng.uniform(0.1, 0.9, V + 1)
    attr[9] = rng.uniform(0.5, 5.0, V + 1)
    attr[:, V] = 0.0
    attr_v16 = jnp.asarray(attr)

    cell_idx = jnp.asarray(build_cell_idx_np(counts, starts, pair_slot,
                                             T, K, V))
    comp = make_composite_win(T, ntx, tile_px, K, interpret=False)

    def loss(a):
        out = comp(counts, starts, pair_slot, cell_idx, a)
        return jnp.sum(out[:, 0:5]), out

    (l, out), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(attr_v16)
    _check(name + " fwd+bwd", out, g, l)

    # VALUE check vs a numpy front-to-back oracle on a few tiles: a
    # finite-only check shipped the W=384 dynamic-roll miscompile (wrong
    # colors, perfectly finite — r5); this pins output VALUES on real
    # Mosaic lowering at every smoked K
    from gs_icp_slam_tpu.ops.projection import ALPHA_MAX, ALPHA_MIN, T_EPS
    outs = np.asarray(jax.device_get(out))
    pair_np = np.asarray(jax.device_get(pair_slot))
    for t in range(0, T, max(1, T // 7)):
        run = pair_np[starts_np[t]:starts_np[t] + counts_np[t]]
        a = attr[:, run]
        tx, ty = t % ntx, t // ntx
        pid = np.arange(P)
        px = tx * tile_px + pid % tile_px
        py = ty * tile_px + pid // tile_px
        dx = px[None, :] - a[0][:, None]
        dy = py[None, :] - a[1][:, None]
        power = (-0.5 * (a[2][:, None] * dx * dx + a[4][:, None] * dy * dy)
                 - a[3][:, None] * dx * dy)
        alpha = a[8][:, None] * np.exp(power)
        alpha = np.where((power <= 0) & (alpha >= ALPHA_MIN),
                         np.minimum(alpha, ALPHA_MAX), 0.0)
        tr = np.ones(P)
        rgb = np.zeros((3, P))
        for k in range(alpha.shape[0]):
            t_next = tr * (1.0 - alpha[k])
            inc = t_next >= T_EPS
            w = alpha[k] * tr * inc
            rgb += w * a[5:8, k][:, None]
            tr = np.where(inc, t_next, tr)
        err = np.abs(outs[t, 0:3] - rgb).max()
        assert err < 2e-3, f"{name}: tile {t} oracle mismatch {err}"
    print(f"  ok: {name} oracle values")


def smoke_composite_dyn(T, ntx, tile_px, K):
    from gs_icp_slam_tpu.ops.composite_pallas import make_composite_dyn
    name = f"composite_dyn T={T} tile={tile_px} K={K}"
    rng = np.random.default_rng(1)
    counts = jnp.asarray(rng.integers(0, K + 1, size=(T,)).astype(np.int32))
    attrs = np.zeros((T, 16, K), np.float32)
    attrs[:, 0] = rng.uniform(0, ntx * tile_px, (T, K))
    attrs[:, 1] = rng.uniform(0, (T // ntx) * tile_px, (T, K))
    attrs[:, 2] = 0.05
    attrs[:, 4] = 0.05
    attrs[:, 5:8] = rng.uniform(0, 1, (T, 3, K))
    attrs[:, 8] = rng.uniform(0.1, 0.9, (T, K))
    attrs[:, 9] = rng.uniform(0.5, 5.0, (T, K))
    attrs = jnp.asarray(attrs)
    comp = make_composite_dyn(T, ntx, tile_px, K, interpret=False)

    def loss(a):
        out = comp(counts, a)
        return jnp.sum(out[:, 0:5]), out

    (l, out), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(attrs)
    _check(name + " fwd+bwd", out, g, l)


def smoke_knn():
    from gs_icp_slam_tpu.ops.nn_pallas import (knn_search_pallas,
                                               nn_search_pallas)
    rng = np.random.default_rng(2)
    # production shapes: source ~8k, target bucket 16k-64k
    for S, Tn in ((2048, 8192), (8192, 16384)):
        src = jnp.asarray(rng.uniform(-2, 2, (S, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(-2, 2, (Tn, 3)).astype(np.float32))
        tmask = jnp.ones((Tn,), bool)
        idx, d2 = jax.jit(lambda s, t, m: nn_search_pallas(
            s, t, m, interpret=False))(src, tgt, tmask)
        _check(f"nn_search_pallas S={S} T={Tn}", idx, d2)
    src = jnp.asarray(rng.uniform(-2, 2, (4096, 3)).astype(np.float32))
    tmask = jnp.ones((4096,), bool)
    idx, d2 = jax.jit(lambda s, m: knn_search_pallas(
        s, s, m, k=20, interpret=False))(src, tmask)
    _check("knn_search_pallas 4096 k=20", idx, d2)


def smoke_full_raster(width, height, tile, v_cap, K):
    """The whole production rasterize_tiled fwd+grad at this geometry."""
    from gs_icp_slam_tpu.ops.rasterize import rasterize_tiled
    rng = np.random.default_rng(3)
    N = 4096
    xyz = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32)
                      + np.array([0, 0, 3], np.float32))
    quat = jnp.asarray(
        np.tile(np.array([0, 0, 0, 1], np.float32), (N, 1)))
    scale = jnp.full((N, 3), 0.02, jnp.float32)
    opacity = jnp.full((N,), 0.8, jnp.float32)
    sh = jnp.asarray(rng.uniform(0, 1, (N, 1, 3)).astype(np.float32))
    w2c = jnp.eye(4, dtype=jnp.float32)
    live = jnp.ones((N,), bool)
    bg = jnp.zeros((3,), jnp.float32)
    fx = fy = 0.7 * width
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0

    def loss(x):
        out = rasterize_tiled(
            x, quat, scale, opacity, sh, w2c, live, bg, fx, fy, cx, cy,
            sh_degree=0, width=width, height=height, tile=tile,
            visible_cap=v_cap, tile_span=2, tile_cap=K, chunk=64,
            use_pallas=True, want_used=False)
        return jnp.sum(out.color) + jnp.sum(out.depth), out

    (l, out), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(xyz)
    _check(f"rasterize_tiled {width}x{height} K={K}", out.color, out.depth,
           g, l)


def main():
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})")
    if dev.platform not in ("tpu",):
        print("WARNING: no TPU — Mosaic lowering NOT exercised", flush=True)
    # bench geometry: 1200x680, tile 32 -> 38x22=836 tiles
    smoke_composite_win(836, 38, 32, 384, 16384)
    # small-scene geometry the quality tests use: 128x96, tile 32 -> 12
    smoke_composite_win(12, 4, 32, 512, 4096)
    # K=256: its K+128=384 window is NOT a power of two — the case whose
    # dynamic sublane roll miscompiled before win_span() rounded up (r5)
    smoke_composite_win(96, 12, 32, 256, 4096)
    smoke_composite_dyn(48, 8, 16, 128)
    smoke_knn()
    smoke_full_raster(256, 192, 32, 4096, 256)
    print("ALL KERNEL SMOKES GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
