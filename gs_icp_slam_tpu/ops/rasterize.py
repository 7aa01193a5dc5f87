"""Tiled differentiable gaussian rasterizer — the production TPU path.

Replaces the CUDA diff-gaussian-rasterization submodule (SURVEY §2.10) with
an XLA-native design.  The CUDA kernel's stages and their TPU re-design:

  CUDA (per launch)                     here (per jit call)
  ---------------------------------------------------------------------
  preprocess thread/gaussian            project_gaussians_packed: (10, N)
                                        channel-first attr matrix
  dynamic instance duplication          static (V, D) pair grid, masked
  global 64-bit radix sort              depth argsort of the V compacted
                                        splats + single-key STABLE int32
                                        tile sort of the pairs
  per-tile ranges from sorted keys      searchsorted run starts + gather
  per-tile sequential alpha blending    Pallas VMEM compositor (TPU) or
                                        exclusive-cumprod XLA path
  atomic gradient accumulation (bwd)    plain JAX autodiff: gathers become
                                        scatter-adds automatically; no
                                        atomics needed on TPU

Layout rule that drives the whole file: per-splat data lives CHANNEL-FIRST
(attrs (10, N): mx, my, conic_a/b/c, r, g, b, opacity, depth).  A (N, k)
array on TPU pads its trailing dim to the 128-lane tile, and a row gather
of (N, 3) measured 8.5x slower than the equivalent lane gather of (3, N);
compaction and binning are nothing but gathers.

Static-shape contract: at most V visible gaussians are kept per view
(index-order drop on overflow), each touching at most D x D tiles
(centered clamp of its tile rect), at most K splats composite per tile
(front-most K by depth).  All three are config knobs; overflow degrades
output quality, never correctness/shape.

Differentiable w.r.t. xyz/quat/scale/opacity/sh; the sort and binning only
ever handle integer keys/indices, so autodiff treats the splat ordering as
constant — exactly the CUDA kernel's semantics.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import (ALPHA_MAX, ALPHA_MIN, T_EPS,
                         project_gaussians_packed, tile_rect)


class RasterOut(NamedTuple):
    color: jnp.ndarray    # (3, H, W)
    depth: jnp.ndarray    # (H, W)
    radii: jnp.ndarray    # (N,) int32
    is_used: Optional[jnp.ndarray]  # (N,) bool — splat entered >= 1 tile
                                    # list; None unless want_used=True (no
                                    # reference consumer: SURVEY §2.6 returns
                                    # it but nothing reads it)
    t_final: jnp.ndarray  # (H, W) final transmittance


@partial(jax.jit, static_argnames=(
    "sh_degree", "width", "height", "tile", "visible_cap", "tile_span",
    "tile_cap", "chunk", "use_pallas", "want_used"))
def rasterize_tiled(xyz, quat, scale, opacity, sh, w2c, live, bg,
                    fx, fy, cx, cy, *, sh_degree: int, width: int,
                    height: int, tile: int = 16, visible_cap: int = 65536,
                    tile_span: int = 3, tile_cap: int = 256,
                    chunk: int = 64, use_pallas=None,
                    want_used: bool = True) -> RasterOut:
    """Render one view.  See module docstring for the static-shape contract.

    Args mirror project_gaussians; bg is the (3,) background color.
    use_pallas: None = auto (Pallas compositor on TPU, pure-XLA elsewhere).
    want_used: compute the is_used marker (costs a large scatter; the SLAM
    engine passes False).
    """
    ntx = -(-width // tile)
    nty = -(-height // tile)
    T = ntx * nty
    N = xyz.shape[0]
    V = min(visible_cap, N)
    D = tile_span
    K = tile_cap

    attr, radius_i, visible = project_gaussians_packed(
        xyz, quat, scale, opacity, sh, sh_degree, w2c, fx, fy, cx, cy,
        width, height, live)

    # ---- compact up to V visible splats, FRONT-MOST FIRST ------------------
    # Two stages: an order-free cumsum compaction N -> V (cheap), then a
    # depth argsort of just the V compacted slots.  Depth-ordering the
    # compacted splats lets the pair binning below use a single-key STABLE
    # int32 sort (measured 10x faster on TPU than the (tile, depth) 2-key
    # sort).  On cap overflow stage 1 keeps the lowest-index V visibles
    # (quality-only degradation, like the CUDA kernel's buffer caps).
    vis = visible
    vcount = jnp.sum(vis.astype(jnp.int32))
    pos = jnp.cumsum(vis.astype(jnp.int32)) - 1
    slot = jnp.where(vis & (pos < V), pos, V)
    cidx = jnp.zeros((V,), jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    vslot = jnp.arange(V, dtype=jnp.int32)
    vok = vslot < jnp.minimum(vcount, V)

    cdepth = jnp.where(vok, attr[9, cidx], jnp.inf)
    _, vis_order = jax.lax.sort((cdepth, cidx), num_keys=1)

    attr_c = attr[:, vis_order]                     # (10, V) ONE lane gather
    # invalid tail slots alias splat 0 (cidx init) — zero their opacity
    attr_c = attr_c.at[8].set(jnp.where(vok, attr_c[8], 0.0))
    mx, my = attr_c[0], attr_c[1]
    radius = radius_i[vis_order].astype(jnp.float32)

    # ---- build (V, D*D) tile pairs ---------------------------------------
    # full tile rect (CUDA getRect), then a centered clamp to D x D
    tx0, ty0, tx1, ty1 = tile_rect(mx, my, radius, ntx, nty, tile, D)

    dxy = jnp.arange(D, dtype=jnp.float32)
    gx = tx0[:, None, None] + dxy[None, None, :]  # (V, 1, D)
    gy = ty0[:, None, None] + dxy[None, :, None]  # (V, D, 1)
    pair_ok = ((gx <= tx1[:, None, None]) & (gy <= ty1[:, None, None])
               & vok[:, None, None])
    pair_tile = (gy * ntx + gx).astype(jnp.int32)  # (V, D, D) broadcast

    # ---- sort pairs by tile and build per-tile lists -----------------------
    # Splats are already depth-ordered and pairs are enumerated splat-major,
    # so a STABLE sort on the tile id alone leaves every tile's run in
    # front-to-back order — the exact CUDA (tile, depth) ordering at single-
    # key cost, with no depth-quantization ties.
    SENTINEL = jnp.int32(2 ** 30)
    key_tile = jnp.where(pair_ok, pair_tile, SENTINEL).reshape(-1)
    val = jnp.broadcast_to(vslot[:, None, None], pair_tile.shape).reshape(-1)
    tile_s, val_s = jax.lax.sort((key_tile, val), num_keys=1, is_stable=True)

    # tile t's run is [start[t], start[t+1]); gather beats scatter on TPU
    start = jnp.searchsorted(tile_s, jnp.arange(T + 1, dtype=jnp.int32),
                             method="scan_unrolled").astype(jnp.int32)
    counts = jnp.minimum(start[1:] - start[:-1], K)               # (T,)
    start = start[:-1]
    gpos = jnp.minimum(start[:, None] + jnp.arange(K, dtype=jnp.int32)[None],
                       tile_s.shape[0] - 1)
    hit = tile_s[gpos] == jnp.arange(T, dtype=jnp.int32)[:, None]
    tile_list = jnp.where(hit, val_s[gpos], V)                     # (T, K)

    # ---- composite --------------------------------------------------------
    attr_p = jnp.pad(attr_c, ((0, 0), (0, 1)))     # zero splat at index V
    attrs = attr_p[:, tile_list]                   # (10, T, K) lane gather
    attrs = jnp.swapaxes(attrs, 0, 1)              # (T, 10, K)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    P = tile * tile
    if use_pallas and K % 128 == 0 and P % 128 == 0:
        from .composite_pallas import make_composite_dyn

        attrs16 = jnp.pad(attrs, ((0, 0), (0, 6), (0, 0)))
        comp = make_composite_dyn(T, ntx, tile, K,
                                  interpret=jax.default_backend() != "tpu")
        out8 = comp(counts, attrs16)                # (T, 8, P)
        tfin_px = out8[:, 4]                        # (T, P)
        color_px = out8[:, 0:3] + tfin_px[:, None, :] * bg[None, :, None]
        color_t = jnp.moveaxis(color_px, 1, 2).reshape(T, tile, tile, 3)
        depth_t = out8[:, 3].reshape(T, tile, tile)
        tfin_t = tfin_px.reshape(T, tile, tile)
    else:
        px_in = jnp.arange(tile, dtype=jnp.float32)
        pgx, pgy = jnp.meshgrid(px_in, px_in, indexing="xy")  # (tile, tile)

        def composite_tile(tid, a):
            # a: (10, K) this tile's splat attrs, front-to-back
            ty, tx = tid // ntx, tid % ntx
            px = (tx * tile).astype(jnp.float32) + pgx.reshape(-1)  # (P,)
            py = (ty * tile).astype(jnp.float32) + pgy.reshape(-1)

            dx = px[:, None] - a[0][None, :]  # (P, K)
            dy = py[:, None] - a[1][None, :]
            power = (-0.5 * (a[2][None, :] * dx * dx
                             + a[4][None, :] * dy * dy)
                     - a[3][None, :] * dx * dy)
            alpha = jnp.minimum(ALPHA_MAX, a[8][None, :] * jnp.exp(power))
            alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN),
                              alpha, 0.0)

            one_minus = 1.0 - alpha
            t_next = jnp.cumprod(one_minus, axis=1)
            t_before = jnp.concatenate(
                [jnp.ones_like(t_next[:, :1]), t_next[:, :-1]], axis=1)
            include = t_next >= T_EPS
            w = alpha * t_before * include
            t_final = jnp.where(include, one_minus, 1.0).prod(axis=1)

            col = a[5:8].T                       # (K, 3)
            color = jnp.dot(w, col, preferred_element_type=jnp.float32) \
                + t_final[:, None] * bg[None, :]
            depth_px = jnp.dot(w, a[9][:, None],
                               preferred_element_type=jnp.float32)[:, 0]
            return color, depth_px, t_final

        tile_ids = jnp.arange(T, dtype=jnp.int32)
        n_chunks = -(-T // chunk)
        pad_t = n_chunks * chunk - T
        tiles_padded = jnp.concatenate(
            [tile_ids, jnp.zeros((pad_t,), jnp.int32)]) if pad_t else tile_ids
        attrs_padded = (jnp.concatenate(
            [attrs, jnp.zeros((pad_t,) + attrs.shape[1:], attrs.dtype)])
            if pad_t else attrs)

        composite_chunk = jax.checkpoint(
            lambda args: jax.vmap(composite_tile)(*args))
        color_t, depth_t, tfin_t = jax.lax.map(
            composite_chunk,
            (tiles_padded.reshape(n_chunks, chunk),
             attrs_padded.reshape(n_chunks, chunk, *attrs.shape[1:])))
        color_t = color_t.reshape(T + pad_t, tile, tile, 3)[:T]
        depth_t = depth_t.reshape(T + pad_t, tile, tile)[:T]
        tfin_t = tfin_t.reshape(T + pad_t, tile, tile)[:T]

    # ---- assemble ---------------------------------------------------------
    def untile(x):
        extra = x.shape[3:]
        x = x.reshape(nty, ntx, tile, tile, *extra)
        x = jnp.swapaxes(x, 1, 2).reshape(nty * tile, ntx * tile, *extra)
        return x[:height, :width]

    color = untile(color_t).transpose(2, 0, 1)
    depth_img = untile(depth_t)
    t_final = untile(tfin_t)

    is_used = None
    if want_used:
        used_v = jnp.zeros((V + 1,), bool).at[
            jnp.where(hit, tile_list, V)].set(True, mode="drop")[:V]
        # overflow slots all alias index 0 after cumsum compaction — route
        # them out of bounds so they can't clobber splat 0's flag
        is_used = jnp.zeros((N,), bool).at[
            jnp.where(vok, vis_order, N)].set(used_v, mode="drop")
    return RasterOut(color=color, depth=depth_img, radii=radius_i,
                     is_used=is_used, t_final=t_final)
