"""Tiled differentiable gaussian rasterizer — the production TPU path.

Replaces the CUDA diff-gaussian-rasterization submodule (SURVEY §2.10) with
an XLA-native design.  The CUDA kernel's stages and their TPU re-design:

  CUDA (per launch)                     here (per jit call)
  ---------------------------------------------------------------------
  preprocess thread/gaussian            project_gaussians (batched, §projection)
  dynamic instance duplication          static (V, D) pair grid, masked
  global 64-bit radix sort              one lax.sort on packed uint32 keys
  per-tile ranges from sorted keys      rank-in-segment via cummax
  per-tile sequential alpha blending    exclusive-cumprod composite: the
                                        front-to-back product becomes a
                                        cumprod along the sorted axis, so
                                        all 256 pixels x K splats of a tile
                                        are one dense (VPU/MXU) block
  atomic gradient accumulation (bwd)    plain JAX autodiff: gathers become
                                        scatter-adds automatically; no
                                        atomics needed on TPU

Static-shape contract: at most V visible gaussians are kept per view
(front-most V, depth-sorted drop), each touching at most D x D tiles
(centered clamp of its tile rect), at most K splats composite per tile
(front-most K by depth).  All three are config knobs; overflow degrades
output quality, never correctness/shape.

Differentiable w.r.t. xyz/quat/scale/opacity/sh; the sort and binning only
ever handle integer keys/indices, so autodiff treats the splat ordering as
constant — exactly the CUDA kernel's semantics.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import (ALPHA_MAX, ALPHA_MIN, T_EPS, project_gaussians,
                         tile_rect)


class RasterOut(NamedTuple):
    color: jnp.ndarray    # (3, H, W)
    depth: jnp.ndarray    # (H, W)
    radii: jnp.ndarray    # (N,) int32
    is_used: jnp.ndarray  # (N,) bool — splat entered >= 1 tile list
    t_final: jnp.ndarray  # (H, W) final transmittance


def _ranks_in_segments(seg_ids: jnp.ndarray) -> jnp.ndarray:
    """Position of each element within its run of equal (sorted) seg_ids."""
    n = seg_ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    changed = jnp.concatenate(
        [jnp.ones((1,), bool), seg_ids[1:] != seg_ids[:-1]])
    starts = jnp.where(changed, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, starts)
    return idx - seg_start


@partial(jax.jit, static_argnames=(
    "sh_degree", "width", "height", "tile", "visible_cap", "tile_span",
    "tile_cap", "chunk", "use_pallas"))
def rasterize_tiled(xyz, quat, scale, opacity, sh, w2c, live, bg,
                    fx, fy, cx, cy, *, sh_degree: int, width: int,
                    height: int, tile: int = 16, visible_cap: int = 65536,
                    tile_span: int = 3, tile_cap: int = 256,
                    chunk: int = 64, use_pallas=None) -> RasterOut:
    """Render one view.  See module docstring for the static-shape contract.

    Args mirror project_gaussians; bg is the (3,) background color.
    use_pallas: None = auto (Pallas compositor on TPU, pure-XLA elsewhere).
    """
    ntx = -(-width // tile)
    nty = -(-height // tile)
    T = ntx * nty
    N = xyz.shape[0]
    V = min(visible_cap, N)
    D = tile_span
    K = tile_cap

    splats = project_gaussians(xyz, quat, scale, opacity, sh, sh_degree,
                               w2c, fx, fy, cx, cy, width, height, live)

    # ---- compact up to V visible splats -----------------------------------
    # Order-free cumsum compaction (no O(N log N) sort: within-tile depth
    # ordering happens at the pair sort below).  On overflow the lowest-
    # index V visibles survive rather than the front-most — quality-only.
    vis = splats.visible
    vcount = jnp.sum(vis.astype(jnp.int32))
    pos = jnp.cumsum(vis.astype(jnp.int32)) - 1
    slot = jnp.where(vis & (pos < V), pos, V)
    vis_order = jnp.zeros((V,), jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    vslot = jnp.arange(V, dtype=jnp.int32)
    vok = vslot < jnp.minimum(vcount, V)

    mean2d = splats.mean2d[vis_order]
    conic = splats.conic[vis_order]
    rgb = splats.rgb[vis_order]
    opa = splats.opacity[vis_order]
    depth = splats.depth[vis_order]
    radius = splats.radius[vis_order].astype(jnp.float32)

    # ---- build (V, D*D) tile pairs ---------------------------------------
    # full tile rect (CUDA getRect), then a centered clamp to D x D
    tx0, ty0, tx1, ty1 = tile_rect(mean2d, radius, ntx, nty, tile, D)

    dxy = jnp.arange(D, dtype=jnp.float32)
    gx = tx0[:, None, None] + dxy[None, None, :]  # (V, 1, D)
    gy = ty0[:, None, None] + dxy[None, :, None]  # (V, D, 1)
    pair_ok = ((gx <= tx1[:, None, None]) & (gy <= ty1[:, None, None])
               & vok[:, None, None])
    pair_tile = (gy * ntx + gx).astype(jnp.int32)  # (V, D, D) broadcast

    # lexicographic (tile, float depth) sort — exact CUDA ordering without
    # the quantization ties a packed integer key would introduce
    SENTINEL = jnp.int32(2 ** 30)
    key_tile = jnp.where(pair_ok, pair_tile, SENTINEL).reshape(-1)
    key_depth = jnp.broadcast_to(depth[:, None, None],
                                 pair_tile.shape).reshape(-1)
    val = jnp.broadcast_to(vslot[:, None, None], pair_tile.shape).reshape(-1)

    # ---- sort pairs by (tile, depth) and build per-tile lists -------------
    tile_s, _, val_s = jax.lax.sort((key_tile, key_depth, val), num_keys=2)
    rank = _ranks_in_segments(tile_s)
    ok = (tile_s < T) & (rank < K)
    flat_pos = jnp.where(ok, tile_s * K + rank, T * K)
    tile_list = jnp.full((T * K,), V, jnp.int32).at[flat_pos].set(
        val_s, mode="drop").reshape(T, K)

    used_v = jnp.zeros((V + 1,), bool).at[
        jnp.where(ok, val_s, V)].set(True, mode="drop")[:V]

    # ---- pad compacted attrs with a zero splat at index V -----------------
    def pad(x):
        return jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)])

    mean2d_p = pad(mean2d)
    conic_p = pad(conic)
    rgb_p = pad(rgb)
    opa_p = pad(jnp.where(vok, opa, 0.0))
    depth_p = pad(depth)

    # ---- composite --------------------------------------------------------
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    P = tile * tile
    if use_pallas and K % 128 == 0 and P % 128 == 0:
        from .composite_pallas import make_composite

        attr_mat = jnp.stack([
            mean2d_p[:, 0], mean2d_p[:, 1], conic_p[:, 0], conic_p[:, 1],
            conic_p[:, 2], rgb_p[:, 0], rgb_p[:, 1], rgb_p[:, 2], opa_p,
            depth_p], axis=0)                       # (10, V+1)
        attrs = jnp.moveaxis(attr_mat[:, tile_list], 0, 1)  # (T, 10, K)
        attrs = jnp.pad(attrs, ((0, 0), (0, 6), (0, 0)))
        comp = make_composite(T, ntx, tile, K,
                              interpret=jax.default_backend() != "tpu")
        out8 = comp(attrs)                          # (T, 8, P)
        tfin_px = out8[:, 4]                        # (T, P)
        color_px = out8[:, 0:3] + tfin_px[:, None, :] * bg[None, :, None]
        color_t = jnp.moveaxis(color_px, 1, 2).reshape(T, tile, tile, 3)
        depth_t = out8[:, 3].reshape(T, tile, tile)
        tfin_t = tfin_px.reshape(T, tile, tile)
        return _assemble(color_t, depth_t, tfin_t, splats, vis_order, used_v,
                         vok, ntx, nty, tile, height, width, N)

    tile_ids = jnp.arange(T, dtype=jnp.int32)
    px_in = jnp.arange(tile, dtype=jnp.float32)
    pgx, pgy = jnp.meshgrid(px_in, px_in, indexing="xy")  # (tile, tile)

    def composite_tile(tid):
        ids = tile_list[tid]  # (K,)
        m = mean2d_p[ids]
        c = conic_p[ids]
        col = rgb_p[ids]
        op = opa_p[ids]
        dep = depth_p[ids]

        ty, tx = tid // ntx, tid % ntx
        px = (tx * tile).astype(jnp.float32) + pgx.reshape(-1)  # (P,)
        py = (ty * tile).astype(jnp.float32) + pgy.reshape(-1)

        dx = px[:, None] - m[None, :, 0]  # (P, K)
        dy = py[:, None] - m[None, :, 1]
        power = (-0.5 * (c[None, :, 0] * dx * dx + c[None, :, 2] * dy * dy)
                 - c[None, :, 1] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, op[None, :] * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

        one_minus = 1.0 - alpha
        t_next = jnp.cumprod(one_minus, axis=1)
        t_before = jnp.concatenate(
            [jnp.ones_like(t_next[:, :1]), t_next[:, :-1]], axis=1)
        include = t_next >= T_EPS
        w = alpha * t_before * include
        t_final = jnp.where(include, one_minus, 1.0).prod(axis=1)

        color = jnp.dot(w, col, preferred_element_type=jnp.float32) \
            + t_final[:, None] * bg[None, :]
        depth_px = jnp.dot(w, dep[:, None],
                           preferred_element_type=jnp.float32)[:, 0]
        return color, depth_px, t_final

    n_chunks = -(-T // chunk)
    pad_t = n_chunks * chunk - T
    tiles_padded = jnp.concatenate(
        [tile_ids, jnp.zeros((pad_t,), jnp.int32)]) if pad_t else tile_ids

    composite_chunk = jax.checkpoint(jax.vmap(composite_tile))
    color_t, depth_t, tfin_t = jax.lax.map(
        composite_chunk, tiles_padded.reshape(n_chunks, chunk))
    color_t = color_t.reshape(T + pad_t, tile, tile, 3)[:T]
    depth_t = depth_t.reshape(T + pad_t, tile, tile)[:T]
    tfin_t = tfin_t.reshape(T + pad_t, tile, tile)[:T]
    return _assemble(color_t, depth_t, tfin_t, splats, vis_order, used_v,
                     vok, ntx, nty, tile, height, width, N)


def _assemble(color_t, depth_t, tfin_t, splats, vis_order, used_v, vok,
              ntx, nty, tile, height, width, N):
    def untile(x):
        extra = x.shape[3:]
        x = x.reshape(nty, ntx, tile, tile, *extra)
        x = jnp.swapaxes(x, 1, 2).reshape(nty * tile, ntx * tile, *extra)
        return x[:height, :width]

    color = untile(color_t).transpose(2, 0, 1)
    depth_img = untile(depth_t)
    t_final = untile(tfin_t)

    # overflow slots all alias index 0 after cumsum compaction — route
    # them out of bounds so they can't clobber splat 0's flag
    is_used = jnp.zeros((N,), bool).at[
        jnp.where(vok, vis_order, N)].set(used_v, mode="drop")
    return RasterOut(color=color, depth=depth_img, radii=splats.radius,
                     is_used=is_used, t_final=t_final)
