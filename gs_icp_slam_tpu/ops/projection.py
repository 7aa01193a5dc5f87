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


def tile_rect(mx: jnp.ndarray, my: jnp.ndarray, radius: jnp.ndarray,
              ntx: int, nty: int, tile: int, span: int):
    """Tile rectangle covered by each splat (CUDA getRect), clamped to a
    span x span window centered on the splat's own tile.

    The span clamp is the tiled renderer's static-shape contract: a splat
    can enter at most span^2 tile lists.  Takes the splat centers as
    component arrays mx/my (N,).  Returns inclusive float bounds
    (tx0, ty0, tx1, ty1); empty rects (radius 0) produce tx1 < tx0.
    """
    tx_min = jnp.floor((mx - radius) / tile)
    tx_max = jnp.floor((mx + radius) / tile)
    ty_min = jnp.floor((my - radius) / tile)
    ty_max = jnp.floor((my + radius) / tile)
    ctx = jnp.floor(mx / tile)
    cty = jnp.floor(my / tile)
    half = (span - 1) // 2
    # Anchor at the TRUE rect whenever it fits in the span window —
    # exact coverage for every splat at most span tiles wide (the common
    # case) — and fall back to the centered clamp only for oversize
    # splats.  The unconditional centered clamp at span=2 (half=0) NEVER
    # extended left/up of the splat's own tile, silently cropping the
    # left/top lobe of every tile-straddling splat: fixing it took the
    # bench's 2-iteration in-run PSNR 21.1 -> 23.9 dB and wall-refined
    # 31.6 -> 41.1 dB at identical speed (r5).
    fits_x = (tx_max - tx_min) <= (span - 1)
    fits_y = (ty_max - ty_min) <= (span - 1)
    ax = jnp.where(fits_x, tx_min, jnp.maximum(tx_min, ctx - half))
    ay = jnp.where(fits_y, ty_min, jnp.maximum(ty_min, cty - half))
    tx0 = jnp.clip(ax, 0, ntx - 1)
    ty0 = jnp.clip(ay, 0, nty - 1)
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


def _cov3d_components(quat: jnp.ndarray, scale: jnp.ndarray):
    """Symmetric Sigma = R S^2 R^T as six (N,) components (no (N,3,3)
    buffer: on TPU a materialized trailing-3x3 array pads to the (8,128)
    tile, so component math keeps everything fused on the VPU)."""
    n = jnp.sqrt(jnp.sum(quat * quat, axis=-1))
    n = jnp.maximum(n, 1e-12)
    x, y, z, w = (quat[:, 0] / n, quat[:, 1] / n, quat[:, 2] / n,
                  quat[:, 3] / n)
    # rotation matrix rows from xyzw quaternion (utils/quat.py convention)
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = scale[:, 0] ** 2
    s1 = scale[:, 1] ** 2
    s2 = scale[:, 2] ** 2
    sxx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    sxy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    sxz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    syy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    syz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    szz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return sxx, sxy, sxz, syy, syz, szz


def project_gaussians_packed(xyz: jnp.ndarray, quat: jnp.ndarray,
                             scale: jnp.ndarray, opacity: jnp.ndarray,
                             sh: jnp.ndarray, sh_degree: int,
                             w2c: jnp.ndarray, fx: float, fy: float,
                             cx: float, cy: float, width: int, height: int,
                             live: jnp.ndarray, znear: float = 0.2,
                             scale_modifier: float = 1.0):
    """Channel-first preprocess: the hot-path variant of project_gaussians.

    Returns (attr (10, N) f32, radius (N,) int32, visible (N,) bool) with
    attr rows [mx, my, conic_a, conic_b, conic_c, r, g, b, opacity, depth].
    All intermediates are (N,) component arrays — no (N, small) buffers,
    which on TPU pad their trailing dim to the 128-lane tile and turn both
    the math and the downstream compaction gathers into row-wise crawls.
    """
    R = w2c[:3, :3]
    tvec = w2c[:3, 3]
    t = xyz @ R.T + tvec  # (N, 3) camera-space (MXU)
    tx_, ty_, z = t[:, 0], t[:, 1], t[:, 2]
    in_front = z > znear

    safe_z = jnp.where(in_front, z, 1.0)
    inv_z = 1.0 / safe_z
    mx = fx * tx_ * inv_z + cx
    my = fy * ty_ * inv_z + cy

    lim_x = 1.3 * (width / (2.0 * fx))
    lim_y = 1.3 * (height / (2.0 * fy))
    txz = jnp.clip(tx_ * inv_z, -lim_x, lim_x)
    tyz = jnp.clip(ty_ * inv_z, -lim_y, lim_y)

    sxx, sxy, sxz, syy, syz, szz = _cov3d_components(
        quat, scale * scale_modifier)

    # camera-frame covariance W Sigma W^T, W = R (3x3 scalars x (N,) vecs)
    w00, w01, w02 = R[0, 0], R[0, 1], R[0, 2]
    w10, w11, w12 = R[1, 0], R[1, 1], R[1, 2]
    w20, w21, w22 = R[2, 0], R[2, 1], R[2, 2]

    def row(wa, wb, wc):
        # (W Sigma) row: returns the three components of wa..wc . Sigma
        m0 = wa * sxx + wb * sxy + wc * sxz
        m1 = wa * sxy + wb * syy + wc * syz
        m2 = wa * sxz + wb * syz + wc * szz
        return m0, m1, m2

    m00, m01, m02 = row(w00, w01, w02)
    m10, m11, m12 = row(w10, w11, w12)
    m20, m21, m22 = row(w20, w21, w22)
    a = m00 * w00 + m01 * w01 + m02 * w02   # Sigma_cam[0,0]
    b = m00 * w10 + m01 * w11 + m02 * w12   # Sigma_cam[0,1]
    c = m00 * w20 + m01 * w21 + m02 * w22   # Sigma_cam[0,2]
    d = m10 * w10 + m11 * w11 + m12 * w12   # Sigma_cam[1,1]
    e = m10 * w20 + m11 * w21 + m12 * w22   # Sigma_cam[1,2]
    f = m20 * w20 + m21 * w21 + m22 * w22   # Sigma_cam[2,2]

    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z

    c00 = j00 * (j00 * a + j02 * c) + j02 * (j00 * c + j02 * f) + 0.3
    c01 = j11 * (j00 * b + j02 * e) + j12 * (j00 * c + j02 * f)
    c11 = j11 * (j11 * d + j12 * e) + j12 * (j11 * e + j12 * f) + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic_a = c11 * inv_det
    conic_b = -c01 * inv_det
    conic_c = c00 * inv_det

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    on_screen = ((mx > -radius_f) & (mx < width + radius_f)
                 & (my > -radius_f) & (my < height + radius_f))
    visible = live & in_front & det_ok & on_screen
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    if sh_degree == 0:
        # SLAM mode: band 0 only, no view direction needed
        from ..utils.sh import C0
        rr = jnp.maximum(C0 * sh[:, 0, 0] + 0.5, 0.0)
        gg = jnp.maximum(C0 * sh[:, 0, 1] + 0.5, 0.0)
        bb = jnp.maximum(C0 * sh[:, 0, 2] + 0.5, 0.0)
    else:
        campos = -tvec @ R
        dirs = xyz - campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        rgb = jnp.maximum(
            eval_sh(sh_degree, jnp.swapaxes(sh, -1, -2), dirs) + 0.5, 0.0)
        rr, gg, bb = rgb[:, 0], rgb[:, 1], rgb[:, 2]

    attr = jnp.stack([mx, my, conic_a, conic_b, conic_c, rr, gg, bb,
                      opacity, z], axis=0)
    return attr, radius, visible


def project_gaussians(xyz: jnp.ndarray, quat: jnp.ndarray,
                      scale: jnp.ndarray, opacity: jnp.ndarray,
                      sh: jnp.ndarray, sh_degree: int,
                      w2c: jnp.ndarray, fx: float, fy: float,
                      cx: float, cy: float, width: int, height: int,
                      live: jnp.ndarray, znear: float = 0.2,
                      scale_modifier: float = 1.0) -> Splats2D:
    """Preprocess N gaussians for one view (struct-of-rows view of
    project_gaussians_packed, for the dense reference renderer and tests).

    Args:
      xyz (N,3) world positions; quat (N,4) xyzw; scale (N,3) linear extents;
      opacity (N,) in [0,1]; sh (N, (deg+1)^2, 3) SH coefficients (band-major
      rows, channels last); w2c (4,4);
      live (N,) bool — dead map slots are culled unconditionally.
    """
    attr, radius, visible = project_gaussians_packed(
        xyz, quat, scale, opacity, sh, sh_degree, w2c, fx, fy, cx, cy,
        width, height, live, znear, scale_modifier)
    return Splats2D(mean2d=attr[0:2].T, conic=attr[2:5].T, radius=radius,
                    depth=attr[9], rgb=attr[5:8].T, opacity=attr[8],
                    visible=visible)
