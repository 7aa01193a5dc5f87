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


@partial(jax.custom_vjp, nondiff_argnums=())
def _compact_cols(mat, idx, inv_v):
    """mat[:, idx] where idx = [order_full[:V], N] (unique) and inv_v is
    the inverse permutation clipped to V: inv_v[n] = slot of column n, or
    >= V if not selected.  The custom VJP turns the gather's transpose
    into ANOTHER gather through inv_v — the autodiff scatter-add at
    (16, 64k) measured ~2.7 ms on v5e, the inverse gather ~0.2 ms.
    inv_v itself costs one extra 2-operand sort of order_full (~0.1 ms);
    a scatter-set inverse was tried and was as slow as the scatter-add."""
    return mat[:, idx]


def _compact_cols_fwd(mat, idx, inv_v):
    return mat[:, idx], inv_v


def _compact_cols_bwd(inv_v, g):
    # g: (R, V+1); column V is the zero-splat pad and carries zero grad,
    # so clipping unselected columns to it yields their exact zero
    V = g.shape[1] - 1
    idxN = jnp.minimum(inv_v, V)
    d_mat = jnp.concatenate([g[:, idxN], g[:, V:V + 1]], axis=1)
    return d_mat, None, None


_compact_cols.defvjp(_compact_cols_fwd, _compact_cols_bwd)


class RasterOut(NamedTuple):
    color: jnp.ndarray    # (3, H, W)
    depth: jnp.ndarray    # (H, W)
    radii: jnp.ndarray    # (N,) int32
    is_used: Optional[jnp.ndarray]  # (N,) bool — splat entered >= 1 tile
                                    # list; None unless want_used=True (no
                                    # reference consumer: SURVEY §2.6 returns
                                    # it but nothing reads it)
    t_final: jnp.ndarray  # (H, W) final transmittance
    stats: jnp.ndarray    # (3,) int32 [n_visible, vis_cap_dropped,
                          # tile_cap_dropped] — static-cap overflow
                          # observability (caps degrade quality silently;
                          # these make the loss measurable)


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
    # ONE sort over all N with key = (depth if visible else +inf): the first
    # V output slots are the front-most visible splats in depth order.  This
    # replaces a cumsum compaction + scatter + second sort (measured ~3x
    # slower combined) and makes visible-cap overflow drop the FARTHEST
    # splats — the least-visible ones — instead of arbitrary indices.
    vcount = jnp.sum(visible.astype(jnp.int32))
    depth_key = jnp.where(visible, attr[9], jnp.inf)
    _, order_full = jax.lax.sort(
        (depth_key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    vis_order = order_full[:V]                      # (V,) indices into N
    vslot = jnp.arange(V, dtype=jnp.int32)
    vok = vslot < jnp.minimum(vcount, V)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    P = tile * tile
    pallas_path = use_pallas and K % 128 == 0 and P % 128 == 0

    # only the pair build needs per-splat screen data at V: two lane rows
    # + the radius.  On the Pallas path these are SLICES of the compacted
    # attr_v16 table (built below anyway for the payload) — standalone
    # attr[0, vis_order] gathers got layout-assigned onto the row-gather
    # engine once the payload consumer transposed the attr buffer, and
    # measured 0.5 ms EACH (r5 trace); the radius rides along as an 11th
    # compacted row for the same reason.
    if pallas_path:
        vis_order_p = jnp.concatenate(
            [vis_order, jnp.full((1,), N, jnp.int32)])
        attr_p = jnp.pad(attr, ((0, 0), (0, 1)))
        # order_full is a FULL permutation, so its inverse is one more
        # 2-operand sort; _compact_cols then makes the compaction
        # backward a gather instead of a (16, V) scatter-add
        _, inv_full = jax.lax.sort(
            (order_full, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        radius_row = jnp.where(visible, radius_i.astype(jnp.float32), 0.0)
        attr11 = jnp.concatenate(
            [attr_p, jnp.pad(radius_row, (0, 1))[None]], axis=0)
        attr_v16 = jnp.pad(_compact_cols(attr11, vis_order_p, inv_full),
                           ((0, 5), (0, 0)))
        mx = attr_v16[0, :V]
        my = attr_v16[1, :V]
        radius = attr_v16[10, :V]  # 0 where invisible (radius_row mask)
    else:
        mx = attr[0, vis_order]
        my = attr[1, vis_order]
        radius = jnp.where(vok, radius_i[vis_order], 0).astype(jnp.float32)

    # ---- build (D*D, V) tile pairs, CHANNEL-FIRST --------------------------
    # (V, D, D) layouts pad their trailing dims to the (8, 128) TPU tile —
    # a 38x HBM blowup measured at ~11 ms; (D*D, V) rows are dense.
    tx0, ty0, tx1, ty1 = tile_rect(mx, my, radius, ntx, nty, tile, D)
    dd = jnp.arange(D * D, dtype=jnp.float32)
    gx = tx0[None, :] + (dd % D)[:, None]           # (D*D, V)
    gy = ty0[None, :] + (dd // D)[:, None]
    pair_ok = (gx <= tx1[None, :]) & (gy <= ty1[None, :]) & vok[None, :]
    pair_tile = (gy * ntx + gx).astype(jnp.int32)

    # ---- composite sort key: (tile << S) | compacted slot ------------------
    # Slots are depth-ranked, so ONE non-stable single-operand int32 sort
    # yields tiles in front-to-back order — the CUDA kernel's 64-bit
    # (tile, depth) radix sort collapsed into 31 bits, with no value
    # operand and no stable-sort overhead.
    S = max(V - 1, 1).bit_length()
    assert (T << S) < 2 ** 31, (
        f"tile/slot key overflow: T={T}, V={V}; lower visible_cap or use "
        f"larger tiles")
    SENTINEL = jnp.int32(2 ** 31 - 1)
    keys = jnp.where(pair_ok, (pair_tile << S) | vslot[None, :],
                     SENTINEL).reshape(-1)
    # pair ids ride the sort: the backward needs the INVERSE permutation
    # (pair -> sorted row) to turn the compositor's per-cell gradients
    # into per-splat gradients by gather instead of scatter-add
    pair_id = jnp.arange(keys.shape[0], dtype=jnp.int32)
    key_s, pid_s = jax.lax.sort((keys, pair_id), num_keys=1)

    # tile t's run is [start[t], start[t+1])
    start = jnp.searchsorted(
        key_s, (jnp.arange(T + 1, dtype=jnp.int32) << S),
        method="scan_unrolled").astype(jnp.int32)
    run = start[1:] - start[:-1]                                  # (T,)
    counts = jnp.minimum(run, K)
    pair_dropped = jnp.sum(run - counts)
    start = start[:-1]

    if pallas_path:
        # ---- pair-window composite (no dense tile gather) ---------------
        # pair_slot is pure arithmetic on the sorted keys; the kernel
        # reads each tile's contiguous payload window directly
        # (composite_pallas.make_composite_win).  profile_gather.py: the
        # dense-gather chain this replaces cost ~23 ms/frame.
        from .composite_pallas import make_composite_win

        pair_slot = jnp.minimum(key_s & ((1 << S) - 1), V)  # sentinel -> V
        # attr_v16 (the compacted 16-row table incl. the radius row) was
        # built above, before the pair build, so mx/my/radius are slices
        # pad pair rows so the last tiles' ALIGNED win_span(K)-wide
        # windows stay in bounds (the kernel floors window starts to 128)
        from .composite_pallas import win_span
        pair_slot = jnp.concatenate(
            [pair_slot, jnp.full((win_span(K),), V, jnp.int32)])

        # inverse map for the backward: pair (d, v) -> dense cell t*K +
        # rank-in-tile (or T*K when dropped/invalid).  Rank is free:
        # sorted row r of tile t has rank r - run_start(r), where
        # run_start rides a cummax over run boundaries — the start[t_of_r]
        # table gather this replaces measured 1.4 ms/iteration on v5e
        # (262k-row gathers pay ~5 ns/row; the log-step scan is pure VPU).
        # The inverse permutation is applied by SORTING (pid_s, cell_of_r)
        # — a 262k scatter-set measured 3.0 ms, the 2-operand sort 0.2 ms
        # (TPU scatters serialize; sorts don't).
        Npr = key_s.shape[0]
        rr = jnp.arange(Npr, dtype=jnp.int32)
        t_of_r = jnp.clip(key_s >> S, 0, T - 1)
        new_run = jnp.concatenate(
            [jnp.ones((1,), bool), t_of_r[1:] != t_of_r[:-1]])
        run_start = jax.lax.cummax(jnp.where(new_run, rr, 0))
        k_of_r = rr - run_start
        cell_of_r = jnp.where((key_s != SENTINEL) & (k_of_r < K),
                              t_of_r * K + k_of_r, T * K)
        _, cell_idx = jax.lax.sort((pid_s, cell_of_r), num_keys=1)
        cell_idx = cell_idx.reshape(D * D, V)

        comp = make_composite_win(T, ntx, tile, K,
                                  interpret=jax.default_backend() != "tpu")
        out8 = comp(counts, start, pair_slot, cell_idx,
                    attr_v16)   # (T, 8, P)
        tfin_px = out8[:, 4]                        # (T, P)
        color_px = out8[:, 0:3] + tfin_px[:, None, :] * bg[None, :, None]
        # CHANNEL-FIRST assembly straight from (T, C, P): the previous
        # moveaxis -> (T, P, 3) -> HWC -> transpose chain materialized
        # trailing-3 layouts (padded to the 128-lane tile) whose forward
        # AND vjp transposes traced at ~1.7 ms each per mapping
        # iteration; this path never leaves channel-first
        def untile_cf(x):
            # (T, C, P) -> (C, H, W)
            C = x.shape[1]
            x = x.reshape(nty, ntx, C, tile, tile)
            x = jnp.moveaxis(x, 2, 0)               # (C, nty, ntx, t, t)
            x = jnp.swapaxes(x, 2, 3)               # (C, nty, t, ntx, t)
            return x.reshape(C, nty * tile, ntx * tile)[:, :height, :width]

        color = untile_cf(color_px)
        depth_img = untile_cf(out8[:, 3:4])[0]
        t_final = untile_cf(out8[:, 4:5])[0]
        if want_used:
            gpos = jnp.minimum(
                start[:, None] + jnp.arange(K, dtype=jnp.int32)[None],
                key_s.shape[0] - 1)
            hit = (jnp.arange(K, dtype=jnp.int32)[None, :]
                   < counts[:, None])
            tile_list = jnp.where(hit, key_s[gpos] & ((1 << S) - 1), V)
    else:
        gpos = jnp.minimum(
            start[:, None] + jnp.arange(K, dtype=jnp.int32)[None],
            key_s.shape[0] - 1)
        hit = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
        tile_list = jnp.where(hit, key_s[gpos] & ((1 << S) - 1), V)

        # composed gather: tile_list -> compacted slot -> splat row
        vis_order_p = jnp.concatenate(
            [vis_order, jnp.full((1,), N, jnp.int32)])
        full_list = vis_order_p[tile_list]               # (T, K) int32
        attr_p = jnp.pad(attr, ((0, 0), (0, 1)))
        attrs = attr_p[:, full_list]                     # (10, T, K)
        attrs = jnp.swapaxes(attrs, 0, 1)                # (T, 10, K)
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

        # ---- assemble (XLA fallback path only; the Pallas path builds
        # the channel-first images directly above) --------------------------
        def untile(x):
            extra = x.shape[3:]
            x = x.reshape(nty, ntx, tile, tile, *extra)
            x = jnp.swapaxes(x, 1, 2).reshape(nty * tile, ntx * tile,
                                              *extra)
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
    stats = jnp.stack([vcount, jnp.maximum(vcount - V, 0), pair_dropped])
    return RasterOut(color=color, depth=depth_img, radii=radius_i,
                     is_used=is_used, t_final=t_final, stats=stats)
