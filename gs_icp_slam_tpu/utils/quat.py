"""Quaternion utilities.  Convention: **xyzw** (scalar-last), matching the
reference system end to end (reference: utils/general_utils.py:96-110 builds
rotation matrices from xyzw quats; mp_Tracker.py:385-392 multiplies xyzw
quats).  All functions are batched over leading axes and jit/vmap safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion(s) -> rotation matrix/matrices (..., 3, 3).

    Matches the reference `build_rotation` (utils/general_utils.py:82-110):
    the input is normalized first, components are read as x=q[...,0],
    y=q[...,1], z=q[...,2], w=q[...,3].
    """
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix/matrices (..., 3, 3) -> xyzw quaternion(s).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one derived from the largest diagonal pivot (numerically the
    most stable), entirely with `where`, so it is vmap/jit friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the max.
    # candidate w-major
    tw = jnp.maximum(1.0 + tr, 1e-12)
    sw = jnp.sqrt(tw) * 2.0  # 4w
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw

    # candidate x-major
    tx = jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)
    sx = jnp.sqrt(tx) * 2.0  # 4x
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx

    # candidate y-major
    ty = jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)
    sy = jnp.sqrt(ty) * 2.0  # 4y
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy

    # candidate z-major
    tz = jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)
    sz = jnp.sqrt(tz) * 2.0  # 4z
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    # selection: case 0 if tr dominates, else the largest diagonal
    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22

    def sel(a, b, c, d):
        return jnp.where(cond0, a, jnp.where(cond1, b, jnp.where(cond2, c, d)))

    qx = sel(qx_w, qx_x, qx_y, qx_z)
    qy = sel(qy_w, qy_x, qy_y, qy_z)
    qz = sel(qz_w, qz_x, qz_y, qz_z)
    qw = sel(qw_w, qw_x, qw_y, qw_z)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return quat_normalize(q)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, xyzw layout, broadcasting over batches.

    Matches the reference tracker's `quaternion_multiply`
    (mp_Tracker.py:385-392), which rotates source-covariance quats into the
    world frame by left-multiplying with the camera rotation quat.
    """
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
    z = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)
