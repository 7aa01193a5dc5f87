"""SE(3) helpers for the G-ICP Gauss-Newton tracker.

Twist convention: xi = (omega, v) with rotation first; left perturbation
T <- exp(xi^) @ T.  Everything float32 and jit-safe with Taylor fallbacks
near theta = 0.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    row0 = jnp.stack([zero, -wz, wy], axis=-1)
    row1 = jnp.stack([wz, zero, -wx], axis=-1)
    row2 = jnp.stack([-wy, wx, zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (3,) rotation vector -> (3, 3) rotation matrix."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2)
    K = skew(omega)
    K2 = K @ K
    # sin(t)/t and (1-cos t)/t^2 with Taylor guards
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(6,) twist (omega, v) -> (4, 4) homogeneous transform."""
    omega, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2)
    K = skew(omega)
    K2 = K @ K
    small = theta2 < 1e-12
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta),
    )
    eye = jnp.eye(3, dtype=xi.dtype)
    R = so3_exp(omega)
    V = eye + b[..., None, None] * K + c[..., None, None] * K2
    t = (V @ v[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4, 4) transform to (..., 3) points."""
    return pts @ T[:3, :3].T + T[:3, 3]


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out
