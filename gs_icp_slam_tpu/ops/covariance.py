"""Per-point covariance estimation and the covariance <-> (quat, scale)
bridge that implements the paper's covariance-sharing trick.

Mirrors the fast_gicp fork's API semantics (SURVEY §2.9a):
  * estimate_covariances        ~ calculate_*_covariance_with_filter
  * cov_to_quat_scale           ~ get_*_rotationsq / get_*_scales
  * quat_scale_to_reg_cov       ~ set_target_covariances_fromqs
  * plane regularization: eigenvalues -> (eps, 1, 1) ascending, i.e. the
    classic G-ICP plane prior (Segal et al.), fast_gicp RegularizationMethod
    PLANE with eps = 1e-3.

Scales exported to the mapper are sqrt(eigenvalues) of the RAW covariance
(the gaussian sizes), while registration uses the regularized covariance.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.quat import quat_to_rotmat, rotmat_to_quat
from .eigh3 import eigh3x3


def estimate_covariances(points: jnp.ndarray, neighbor_idx: jnp.ndarray,
                         valid: jnp.ndarray,
                         neighbor_sqd: jnp.ndarray | None = None,
                         max_dist: float | None = None):
    """Sample covariance of each point's k neighbors.

    Args:
      points: (N, 3).
      neighbor_idx: (N, k) indices into points (self included).
      valid: (N,) bool — invalid points yield identity covariance.
      neighbor_sqd: (N, k) squared neighbor distances; with `max_dist` set,
        neighbors beyond it are excluded from the covariance — fast_gicp's
        `set_max_knn_distance` (mp_Tracker.py:110 / gs_icp_slam.py:236).
      max_dist: kNN distance cap (LINEAR units, squared internally); None
        or >= ~1e4 disables the gate (the reference default is 99999).
    Returns:
      cov: (N, 3, 3) raw covariances (biased, divided by the neighbor
           count — matching fast_gicp's normalization).
    """
    nbrs = points[neighbor_idx]  # (N, k, 3)
    k = neighbor_idx.shape[1]
    if max_dist is not None and max_dist < 1e4 and neighbor_sqd is not None:
        keep = (neighbor_sqd <= max_dist * max_dist)[..., None]  # (N, k, 1)
        cnt = jnp.maximum(jnp.sum(keep, axis=1), 1).astype(points.dtype)
        mean = jnp.sum(jnp.where(keep, nbrs, 0.0), axis=1,
                       keepdims=True) / cnt[:, None]
        centered = jnp.where(keep, nbrs - mean, 0.0)
        cov = jnp.einsum("nki,nkj->nij", centered, centered) / cnt[..., None]
    else:
        mean = jnp.mean(nbrs, axis=1, keepdims=True)
        centered = nbrs - mean
        cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    eye = jnp.eye(3, dtype=points.dtype)
    return jnp.where(valid[:, None, None], cov, eye)


def regularize_plane(cov: jnp.ndarray, eps: float = 1e-3):
    """G-ICP plane regularization: C -> V diag(eps, 1, 1) V^T (ascending)."""
    _, vecs = eigh3x3(cov)
    d = jnp.array([eps, 1.0, 1.0], cov.dtype)
    return jnp.einsum("...ij,j,...kj->...ik", vecs, d, vecs)


def cov_to_quat_scale(cov: jnp.ndarray):
    """Decompose raw covariances into (xyzw quat, sqrt-eigenvalue scales).

    The rotation columns correspond to ascending eigenvalues; scales are in
    the same order, so quat_scale_to_cov(quat, scale) reconstructs cov.
    """
    vals, vecs = eigh3x3(cov)
    scales = jnp.sqrt(jnp.maximum(vals, 1e-12))
    quat = rotmat_to_quat(vecs)
    return quat, scales


def quat_scale_to_cov(quat: jnp.ndarray, scales: jnp.ndarray):
    """C = R diag(s^2) R^T."""
    R = quat_to_rotmat(quat)
    return jnp.einsum("...ij,...j,...kj->...ik", R, scales * scales, R)


def quat_scale_to_reg_cov6(quat: jnp.ndarray, scales: jnp.ndarray,
                           eps: float = 1e-3) -> jnp.ndarray:
    """Plane-regularized covariance COMPONENTS (6, N) from (quat, scale).

    Channel-first variant of quat_scale_to_reg_cov for the registration
    hot path: no (N, 3, 3) buffer (whose trailing 3x3 pads to the (8, 128)
    TPU tile), rows are [m00, m01, m02, m11, m12, m22].
    """
    n = jnp.sqrt(jnp.sum(quat * quat, axis=-1))
    n = jnp.maximum(n, 1e-12)
    x, y, z, w = (quat[:, 0] / n, quat[:, 1] / n, quat[:, 2] / n,
                  quat[:, 3] / n)
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s2 = scales * scales
    amin = jnp.argmin(s2, axis=-1)
    d0 = jnp.where(amin == 0, eps, 1.0)
    d1 = jnp.where(amin == 1, eps, 1.0)
    d2 = jnp.where(amin == 2, eps, 1.0)
    m00 = d0 * r00 * r00 + d1 * r01 * r01 + d2 * r02 * r02
    m01 = d0 * r00 * r10 + d1 * r01 * r11 + d2 * r02 * r12
    m02 = d0 * r00 * r20 + d1 * r01 * r21 + d2 * r02 * r22
    m11 = d0 * r10 * r10 + d1 * r11 * r11 + d2 * r12 * r12
    m12 = d0 * r10 * r20 + d1 * r11 * r21 + d2 * r12 * r22
    m22 = d0 * r20 * r20 + d1 * r21 * r21 + d2 * r22 * r22
    return jnp.stack([m00, m01, m02, m11, m12, m22], axis=0)


def quat_scale_to_reg_cov(quat: jnp.ndarray, scales: jnp.ndarray, eps: float = 1e-3):
    """Plane-regularized covariance directly from (quat, scale) — no eigh.

    Since C = R diag(s^2) R^T is already an eigendecomposition, plane
    regularization just replaces the smallest s^2 with eps and the others
    with 1, permuting nothing: we only need to find argmin(s).
    Implements the `set_target_covariances_fromqs` path (mp_Tracker.py:288)
    where optimized map-gaussian rotations/scales re-enter G-ICP as target
    covariances.
    """
    R = quat_to_rotmat(quat)
    s2 = scales * scales
    amin = jnp.argmin(s2, axis=-1)
    d = jnp.where(jnp.arange(3) == amin[..., None], eps, 1.0).astype(R.dtype)
    return jnp.einsum("...ij,...j,...kj->...ik", R, d, R)
