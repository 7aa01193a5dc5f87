"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

The G-ICP side needs eigendecompositions of per-point covariances (plane
regularization + quat/scale export) for ~10^4-10^5 points per frame.  A
batched analytic solver is fully vectorized VPU work with no iteration,
unlike LAPACK-style jnp.linalg.eigh; it is also differentiable enough for
our (non-differentiated) uses.

Method: trigonometric eigenvalues (Smith's algorithm) + cross-product
eigenvectors, all branch-free.  Matrices are pre-scaled by their max |entry|
for float32 robustness.  Degenerate (repeated-eigenvalue) cases fall back to
orthogonal completion; for fully isotropic inputs the identity basis is
returned.

Replaces the Eigen solvers inside fast_gicp's covariance regularization
(SURVEY §2.9: eigenvalues -> (1, 1, eps)).
"""
from __future__ import annotations

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def eigvals3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues (ascending) of symmetric (..., 3, 3) matrices."""
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-1, -2)), 1e-30)
    As = A / scale[..., None, None]

    q = jnp.trace(As, axis1=-2, axis2=-1) / 3.0
    B = As - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.where(p > 1e-12, p, 1.0)
    C = B / safe_p[..., None, None]
    # det(C) / 2, clamped into acos domain
    detC = jnp.linalg.det(C)
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam2 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    vals = jnp.stack([lam0, lam1, lam2], axis=-1)
    iso = (p <= 1e-12)[..., None]
    vals = jnp.where(iso, jnp.stack([q, q, q], axis=-1), vals)
    return vals * scale[..., None]


def _null_vector(M: jnp.ndarray, fallback: jnp.ndarray) -> jnp.ndarray:
    """Unit vector v with M v ~ 0 for near-singular symmetric M (..., 3, 3).

    Picks the largest cross product of row pairs; falls back to `fallback`
    when all cross products vanish (eigenvalue multiplicity)."""
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best12 = n12 > n02
    c_b = jnp.where(best12[..., None], c12, c02)
    n_b = jnp.where(best12, n12, n02)
    best01 = n01 > n_b
    c = jnp.where(best01[..., None], c01, c_b)
    n = jnp.where(best01, n01, n_b)
    ok = n > 1e-24
    v = jnp.where(ok[..., None], c / jnp.sqrt(jnp.where(ok, n, 1.0))[..., None], fallback)
    return v


def _any_orthonormal(v: jnp.ndarray) -> jnp.ndarray:
    """Some unit vector orthogonal to unit v (branch-free)."""
    # use the smaller-magnitude axis to avoid degeneracy
    use_x = jnp.abs(v[..., 0]) < 0.9
    ref = jnp.where(
        use_x[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], v.dtype), v.shape),
    )
    u = jnp.cross(v, ref)
    return u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-20)


def eigh3x3(A: jnp.ndarray):
    """Full symmetric 3x3 eigendecomposition.

    Returns:
      vals: (..., 3) eigenvalues ascending.
      vecs: (..., 3, 3) with COLUMNS as the corresponding eigenvectors,
            right-handed (det = +1), so `vecs` is a rotation matrix.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-1, -2)), 1e-30)
    As = A / scale[..., None, None]
    vals_s = eigvals3x3(As)  # already unit-scale

    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), As.shape)
    lam0 = vals_s[..., 0]
    lam2 = vals_s[..., 2]

    # eigenvector of the smallest eigenvalue (most separated for planar
    # covariances -> numerically best)
    e_z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), As[..., 0, :].shape)
    v0 = _null_vector(As - lam0[..., None, None] * eye, fallback=e_z)
    # eigenvector of the largest eigenvalue, orthogonalized against v0
    e_x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), As[..., 0, :].shape)
    v2_raw = _null_vector(As - lam2[..., None, None] * eye, fallback=e_x)
    v2_raw = v2_raw - jnp.sum(v2_raw * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2_raw, axis=-1, keepdims=True)
    v2 = jnp.where(n2 > 1e-10, v2_raw / jnp.maximum(n2, 1e-20), _any_orthonormal(v0))
    v1 = jnp.cross(v2, v0)  # right-handed [v0, v1, v2]

    vecs = jnp.stack([v0, v1, v2], axis=-1)
    return vals_s * scale[..., None], vecs
