"""Dense reference renderer: every pixel composites every gaussian.

O(N * H * W) — for unit tests, gradient checks, and tiny scenes only.  The
production tiled renderer (ops/rasterize.py) must agree with this one to
float tolerance; this one is trivially correct by construction because it
skips binning entirely: it sorts ALL gaussians by depth once and does an
exclusive-cumprod alpha composite per pixel.

Semantics of the CUDA kernel it stands in for (SURVEY §2.10):
  * a splat only covers pixels whose TILE lies inside its (clamped) 3-sigma
    tile rect — the CUDA kernel bins at tile granularity, so splat tails
    beyond the rect are cut even where alpha would still exceed 1/255
  * alpha = min(0.99, opacity * exp(-0.5 d^T conic d)), zeroed when the
    exponent is positive or alpha < 1/255
  * front-to-back order by camera z
  * compositing stops once transmittance would drop below 1e-4
  * color += T_final * background; depth composites like color with NO
    background term (the fork's added depth channel)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import (ALPHA_MAX, ALPHA_MIN, T_EPS, Splats2D,
                         project_gaussians, tile_rect)


def composite_pixels(pix_xy: jnp.ndarray, splats: Splats2D,
                     order: jnp.ndarray, bg: jnp.ndarray,
                     rects=None, tile: int = 16):
    """Alpha-composite depth-ordered splats at given pixel centers.

    Args:
      pix_xy: (P, 2) pixel coordinates.
      splats: preprocessed gaussians (N).
      order: (N,) int32 — indices sorted front-to-back; invisible splats
        must sort to the end with visible=False.
      bg: (3,) background color.
      rects: optional (tx0, ty0, tx1, ty1) per-splat tile rects (pre-sort
        order); when given, a splat covers a pixel only if the pixel's tile
        falls inside its rect — the CUDA binning cutoff.
    Returns:
      color (P, 3), depth (P,), final transmittance (P,),
      contributed (N,) bool — whether each splat touched any pixel.
    """
    mean2d = splats.mean2d[order]
    conic = splats.conic[order]
    rgb = splats.rgb[order]
    opa = splats.opacity[order]
    depth = splats.depth[order]
    vis = splats.visible[order]

    d = pix_xy[:, None, :] - mean2d[None, :, :]  # (P, N, 2)
    power = -0.5 * (conic[None, :, 0] * d[..., 0] ** 2
                    + conic[None, :, 2] * d[..., 1] ** 2) \
        - conic[None, :, 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(ALPHA_MAX, opa[None, :] * jnp.exp(power))
    covered = (power <= 0.0) & (alpha >= ALPHA_MIN) & vis[None, :]
    if rects is not None:
        tx0, ty0, tx1, ty1 = (r[order] for r in rects)
        ptx = jnp.floor(pix_xy[:, 0] / tile)[:, None]
        pty = jnp.floor(pix_xy[:, 1] / tile)[:, None]
        covered = covered & (ptx >= tx0[None]) & (ptx <= tx1[None]) \
            & (pty >= ty0[None]) & (pty <= ty1[None])
    alpha = jnp.where(covered, alpha, 0.0)

    one_minus = 1.0 - alpha
    t_next = jnp.cumprod(one_minus, axis=1)  # T after including k
    t_before = jnp.concatenate(
        [jnp.ones_like(t_next[:, :1]), t_next[:, :-1]], axis=1)
    include = t_next >= T_EPS  # CUDA stops BEFORE the splat that crosses
    w = alpha * t_before * include

    t_final = jnp.where(include, one_minus, 1.0).prod(axis=1)
    color = w @ rgb + t_final[:, None] * bg[None]
    depth_out = w @ depth
    contributed_sorted = jnp.any(w > 0.0, axis=0)
    contributed = jnp.zeros_like(contributed_sorted).at[order].set(
        contributed_sorted)
    return color, depth_out, t_final, contributed


@partial(jax.jit, static_argnames=("sh_degree", "width", "height",
                                   "tile", "tile_span"))
def rasterize_dense(xyz, quat, scale, opacity, sh, sh_degree: int,
                    w2c, fx, fy, cx, cy, width: int, height: int,
                    live, bg, tile: int = 16, tile_span: int = 1_000):
    """Render a full image densely.  Returns the fork's 4-output contract
    (gaussian_renderer/__init__.py:86-94): (color (3,H,W), depth (H,W),
    radii (N,), is_used (N,)).

    tile/tile_span control the CUDA-style tile-rect cutoff; the default
    span is effectively unclamped (the pure getRect behaviour).  Pass the
    tiled renderer's span to reproduce its truncation exactly.
    """
    splats = project_gaussians(xyz, quat, scale, opacity, sh, sh_degree,
                               w2c, fx, fy, cx, cy, width, height, live)
    ntx = -(-width // tile)
    nty = -(-height // tile)
    rects = tile_rect(splats.mean2d[:, 0], splats.mean2d[:, 1],
                      splats.radius.astype(jnp.float32),
                      ntx, nty, tile, tile_span)
    # front-to-back: invisible splats to the back via +inf depth
    key = jnp.where(splats.visible, splats.depth, jnp.inf)
    order = jnp.argsort(key)

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    pix = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

    color, depth, _, contributed = composite_pixels(pix, splats, order, bg,
                                                    rects=rects, tile=tile)
    color = color.reshape(height, width, 3).transpose(2, 0, 1)
    depth = depth.reshape(height, width)
    return color, depth, splats.radius, contributed
