"""Gaussian preprocessing for rasterization: the EWA splatting math.

Replaces the preprocess stage of the CUDA diff-gaussian-rasterization
submodule (SURVEY §2.10, not vendored; semantics reconstructed from the
standard 3DGS kernel the fork extends):

  * world -> camera transform, frustum cull at z <= znear (0.2)
  * 3D covariance from (quat, scale): Sigma = R S S^T R^T
  * EWA projection: Sigma' = J W Sigma W^T J^T (2x2), + 0.3 px low-pass
  * conic = inverse of Sigma', radius = ceil(3 sqrt(lambda_max))
  * SH -> RGB with the 0.5 offset and clamp-to-positive

Everything is batched over N gaussians with masks instead of compaction, so
it vmaps/jits cleanly; both the dense reference renderer and the tiled
production renderer consume this one preprocess.

Pixel convention matches the reference's GL projection path
(utils/graphics_utils.py:51-71 + ndc2Pix): principal point at
((W-1)/2, (H-1)/2); callers pass cx/cy explicitly so tests can use true
intrinsics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.quat import quat_to_rotmat
from ..utils.sh import eval_sh


# Compositing constants of the CUDA kernel (SURVEY §2.10)
ALPHA_MIN = 1.0 / 255.0   # splats fainter than this are skipped
ALPHA_MAX = 0.99          # alpha saturation clamp
T_EPS = 1e-4              # stop compositing when transmittance drops below


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray, ntx: int, nty: int,
              tile: int, span: int):
    """Tile rectangle covered by each splat (CUDA getRect), clamped to a
    span x span window centered on the splat's own tile.

    The span clamp is the tiled renderer's static-shape contract: a splat
    can enter at most span^2 tile lists.  Returns inclusive float bounds
    (tx0, ty0, tx1, ty1); empty rects (radius 0) produce tx1 < tx0.
    """
    tx_min = jnp.floor((mean2d[:, 0] - radius) / tile)
    tx_max = jnp.floor((mean2d[:, 0] + radius) / tile)
    ty_min = jnp.floor((mean2d[:, 1] - radius) / tile)
    ty_max = jnp.floor((mean2d[:, 1] + radius) / tile)
    ctx = jnp.floor(mean2d[:, 0] / tile)
    cty = jnp.floor(mean2d[:, 1] / tile)
    half = (span - 1) // 2
    tx0 = jnp.clip(jnp.maximum(tx_min, ctx - half), 0, ntx - 1)
    ty0 = jnp.clip(jnp.maximum(ty_min, cty - half), 0, nty - 1)
    tx1 = jnp.minimum(jnp.minimum(tx_max, tx0 + (span - 1)), ntx - 1)
    ty1 = jnp.minimum(jnp.minimum(ty_max, ty0 + (span - 1)), nty - 1)
    # splats culled to radius 0 must cover nothing
    empty = radius <= 0.0
    tx1 = jnp.where(empty, tx0 - 1.0, tx1)
    ty1 = jnp.where(empty, ty0 - 1.0, ty1)
    return tx0, ty0, tx1, ty1


class Splats2D(NamedTuple):
    """Per-gaussian screen-space quantities (all length N, masked)."""

    mean2d: jnp.ndarray   # (N, 2) pixel coordinates
    conic: jnp.ndarray    # (N, 3) upper-triangular inverse 2D covariance
    radius: jnp.ndarray   # (N,) int32 pixel radius (0 = culled)
    depth: jnp.ndarray    # (N,) camera-space z
    rgb: jnp.ndarray      # (N, 3) decoded color
    opacity: jnp.ndarray  # (N,) sigmoid-activated opacity
    visible: jnp.ndarray  # (N,) bool — survives frustum cull


def covariance_3d(quat: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T from xyzw quaternion and linear scales."""
    R = quat_to_rotmat(quat)
    s2 = scale * scale
    return jnp.einsum("...ij,...j,...kj->...ik", R, s2, R)


def project_gaussians(xyz: jnp.ndarray, quat: jnp.ndarray,
                      scale: jnp.ndarray, opacity: jnp.ndarray,
                      sh: jnp.ndarray, sh_degree: int,
                      w2c: jnp.ndarray, fx: float, fy: float,
                      cx: float, cy: float, width: int, height: int,
                      live: jnp.ndarray, znear: float = 0.2,
                      scale_modifier: float = 1.0) -> Splats2D:
    """Preprocess N gaussians for one view.

    Args:
      xyz (N,3) world positions; quat (N,4) xyzw; scale (N,3) linear extents;
      opacity (N,) in [0,1]; sh (N, (deg+1)^2, 3) SH coefficients (band-major
      rows, channels last); w2c (4,4);
      live (N,) bool — dead map slots are culled unconditionally.
    """
    R = w2c[:3, :3]
    tvec = w2c[:3, 3]
    t = xyz @ R.T + tvec  # (N, 3) camera-space
    z = t[:, 2]
    in_front = z > znear

    # Perspective projection of the mean (GL-style principal point).
    safe_z = jnp.where(in_front, z, 1.0)
    mean2d = jnp.stack([fx * t[:, 0] / safe_z + cx,
                        fy * t[:, 1] / safe_z + cy], axis=-1)

    # EWA: 2D covariance = J W Sigma W^T J^T with the CUDA kernel's
    # 1.3*tan(fov/2) clamp of the projection point.
    lim_x = 1.3 * (width / (2.0 * fx))
    lim_y = 1.3 * (height / (2.0 * fy))
    txz = jnp.clip(t[:, 0] / safe_z, -lim_x, lim_x)
    tyz = jnp.clip(t[:, 1] / safe_z, -lim_y, lim_y)

    cov3d = covariance_3d(quat, scale * scale_modifier)  # (N,3,3)
    M = jnp.einsum("nij,jk->nik", cov3d, R.T)  # Sigma W^T
    WM = jnp.einsum("ij,njk->nik", R, M)       # W Sigma W^T (camera frame)

    inv_z = 1.0 / safe_z
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z

    a, b, c = WM[:, 0, 0], WM[:, 0, 1], WM[:, 0, 2]
    d, e = WM[:, 1, 1], WM[:, 1, 2]
    f = WM[:, 2, 2]
    # Sigma' = J (camera-frame Sigma) J^T, J = [[j00,0,j02],[0,j11,j12]]
    c00 = j00 * (j00 * a + j02 * c) + j02 * (j00 * c + j02 * f)
    c01 = j11 * (j00 * b + j02 * e) + j12 * (j00 * c + j02 * f)
    c11 = j11 * (j11 * d + j12 * e) + j12 * (j11 * e + j12 * f)
    # low-pass: every splat is at least ~1px (the kernel's +0.3)
    c00 = c00 + 0.3
    c11 = c11 + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    # cull: behind camera, degenerate cov, or projecting outside the screen
    on_screen = ((mean2d[:, 0] > -radius_f) & (mean2d[:, 0] < width + radius_f)
                 & (mean2d[:, 1] > -radius_f) & (mean2d[:, 1] < height + radius_f))
    visible = live & in_front & det_ok & on_screen
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # SH -> RGB along the view direction, with 3DGS's +0.5 / clamp
    campos = -tvec @ R  # camera center in world coords (R^T @ -tvec)
    dirs = xyz - campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-12)
    rgb = jnp.maximum(
        eval_sh(sh_degree, jnp.swapaxes(sh, -1, -2), dirs) + 0.5, 0.0)

    return Splats2D(mean2d=mean2d, conic=conic, radius=radius, depth=z,
                    rgb=rgb, opacity=opacity, visible=visible)
