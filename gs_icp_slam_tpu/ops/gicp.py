"""Generalized-ICP frame-to-map registration, TPU-native.

Replaces the pygicp/fast_gicp C++ library (SURVEY §2.9/§2.9a) with a fully
vectorized JAX implementation:

  * correspondences: fused brute-force 1-NN (ops/knn.py) recomputed every
    Gauss-Newton iteration, gated at max_correspondence_distance^2 on the
    squared distance — matching fast_gicp's kd-tree + threshold gate.
  * distance-minimizing step: Mahalanobis point-to-distribution Gauss-Newton
    over se(3) with left perturbation, inside lax.while_loop with
    fast_gicp-style convergence epsilons (SURVEY §2.9).
  * covariances: plane-regularized (ops/covariance.py); target covariances
    can be injected from optimized map gaussians (covariance sharing).

All shapes are static; invalid slots ride along with zero weight.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GICPConfig
from ..utils.se3 import se3_exp, skew
from .covariance import (estimate_covariances, quat_scale_to_reg_cov,
                         regularize_plane, cov_to_quat_scale)
from .knn import knn_search, nn_search


class GICPTarget(NamedTuple):
    """Fixed-capacity target (map) cloud with registration covariances."""

    points: jnp.ndarray  # (T, 3)
    cov: jnp.ndarray  # (T, 3, 3) plane-regularized
    valid: jnp.ndarray  # (T,) bool


class GICPSource(NamedTuple):
    """Per-frame source cloud (trackable subset of the downsampled frame)."""

    points: jnp.ndarray  # (S, 3) camera-frame
    cov: jnp.ndarray  # (S, 3, 3) plane-regularized, camera-frame
    quat: jnp.ndarray  # (S, 4) xyzw of raw covariance eigenbasis
    scales: jnp.ndarray  # (S, 3) sqrt raw eigenvalues
    valid: jnp.ndarray  # (S,) bool


def _inv3x3_sym(M: jnp.ndarray) -> jnp.ndarray:
    """Cofactor inverse of batched symmetric 3x3 (cheaper than LU solve)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e = M[..., 1, 1], M[..., 1, 2]
    f = M[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    row0 = jnp.stack([A, B, C], axis=-1)
    row1 = jnp.stack([B, D, E], axis=-1)
    row2 = jnp.stack([C, E, F], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def make_source(points: jnp.ndarray, valid: jnp.ndarray,
                cfg: GICPConfig,
                trackable: jnp.ndarray | None = None) -> GICPSource:
    """Estimate source covariances (the fork's set_source_filter +
    calculate covariance path, mp_Tracker.py:191-195).

    Covariances are estimated among `valid` points (all non-zero-depth
    samples — they all become gaussians and need quat/scale inits), while
    `trackable` (valid & z <= depth_trunc) gates which points participate
    in registration; the reference's source filter plays both roles at
    once because Replica's depth_trunc leaves the sets nearly identical.
    """
    if trackable is None:
        trackable = valid
    idx, _ = knn_search(points, points, valid, k=cfg.k_neighbors)
    cov_raw = estimate_covariances(points, idx, valid)
    quat, scales = cov_to_quat_scale(cov_raw)
    cov_reg = regularize_plane(cov_raw, cfg.plane_eps)
    return GICPSource(points=points, cov=cov_reg, quat=quat, scales=scales,
                      valid=trackable)


def target_from_points(points: jnp.ndarray, valid: jnp.ndarray,
                       cfg: GICPConfig):
    """Frame-0 target: covariances from kNN over the (already
    world-transformed) first cloud.  Also returns the raw-covariance
    (quat, scale) pairs used to seed the first gaussians.

    (mp_Tracker.py:157-169)."""
    idx, _ = knn_search(points, points, valid, k=cfg.k_neighbors)
    cov_raw = estimate_covariances(points, idx, valid)
    quat, scales = cov_to_quat_scale(cov_raw)
    cov_reg = regularize_plane(cov_raw, cfg.plane_eps)
    return GICPTarget(points=points, cov=cov_reg, valid=valid), quat, scales


def target_from_gaussians(xyz: jnp.ndarray, quat: jnp.ndarray,
                          scales: jnp.ndarray, valid: jnp.ndarray,
                          cfg: GICPConfig) -> GICPTarget:
    """Covariance sharing, map -> tracker (set_target_covariances_fromqs,
    mp_Tracker.py:286-288): optimized gaussian rotations/scales become the
    registration covariances; no kNN recomputation."""
    cov = quat_scale_to_reg_cov(quat, scales, cfg.plane_eps)
    return GICPTarget(points=xyz, cov=cov, valid=valid)


@partial(jax.jit, static_argnames=("cfg",))
def gicp_align(source: GICPSource, target: GICPTarget, init_T: jnp.ndarray,
               cfg: GICPConfig):
    """Align source onto target starting from init_T (camera-to-world).

    Returns (T, n_iters): the optimized 4x4 transform mapping source
    (camera) points into the target (world) frame.
    """
    sq_gate = cfg.max_correspondence_distance**2

    def weights_and_terms(T):
        R = T[:3, :3]
        p = source.points @ R.T + T[:3, 3]  # (S, 3) transformed
        idx, sqd = nn_search(p, target.points, target.valid)
        w = (source.valid & (sqd < sq_gate)).astype(p.dtype)
        t_pts = target.points[idx]
        t_cov = target.cov[idx]
        # combined covariance in world frame
        RCsRT = jnp.einsum("ij,njk,lk->nil", R, source.cov, R)
        M = _inv3x3_sym(t_cov + RCsRT)
        e = t_pts - p  # (S, 3)
        return p, M, e, w

    def gn_step(T):
        p, M, e, w = weights_and_terms(T)
        Mw = M * w[:, None, None]
        A = skew(p)  # (S, 3, 3); de/domega = +A, de/dv = -I
        AtM = jnp.einsum("nji,njk->nik", A, Mw)  # A^T M
        H00 = jnp.einsum("nij,njk->ik", AtM, A)
        H01 = -jnp.sum(AtM, axis=0)
        H11 = jnp.sum(Mw, axis=0)
        H = jnp.block([[H00, H01], [H01.T, H11]])
        g0 = jnp.einsum("nij,nj->i", AtM, e)
        g1 = -jnp.einsum("nij,nj->i", Mw, e)
        g = jnp.concatenate([g0, g1])
        H = H + cfg.lm_init_lambda * jnp.trace(H) * jnp.eye(6, dtype=H.dtype)
        delta = jnp.linalg.solve(H, -g)
        T_new = se3_exp(delta) @ T
        err = jnp.sum(w * jnp.einsum("ni,nij,nj->n", e, M, e))
        return T_new, delta, err

    def cond(state):
        _, i, converged = state
        return (i < cfg.max_iterations) & (~converged)

    def body(state):
        T, i, _ = state
        T_new, delta, _ = gn_step(T)
        rot_ok = jnp.max(jnp.abs(delta[:3])) < cfg.rotation_epsilon
        trn_ok = jnp.max(jnp.abs(delta[3:])) < cfg.transformation_epsilon
        return T_new, i + 1, rot_ok & trn_ok

    init = (init_T.astype(jnp.float32), jnp.int32(0), jnp.bool_(False))
    T, n_iters, _ = jax.lax.while_loop(cond, body, init)
    return T, n_iters


@jax.jit
def source_correspondences(T: jnp.ndarray, source_points: jnp.ndarray,
                           target: GICPTarget):
    """Squared NN distance of each (transformed) source point in the target —
    the fork's get_source_correspondence (mp_Tracker.py:231), which feeds the
    keyframe overlap ratio and the overlap dedup."""
    p = source_points @ T[:3, :3].T + T[:3, 3]
    idx, sqd = nn_search(p, target.points, target.valid)
    return idx, sqd
