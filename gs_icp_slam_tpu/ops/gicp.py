"""Generalized-ICP frame-to-map registration, TPU-native.

Replaces the pygicp/fast_gicp C++ library (SURVEY §2.9/§2.9a) with a fully
vectorized JAX implementation:

  * correspondences: Pallas VMEM 1-NN (ops/nn_pallas.py) recomputed every
    Gauss-Newton iteration, gated at max_correspondence_distance^2 on the
    squared distance — matching fast_gicp's kd-tree + threshold gate.
  * distance-minimizing step: Mahalanobis point-to-distribution Gauss-Newton
    over se(3) with left perturbation, inside lax.while_loop with
    fast_gicp-style convergence epsilons (SURVEY §2.9).
  * covariances: plane-regularized (ops/covariance.py); target covariances
    can be injected from optimized map gaussians (covariance sharing).

Layout rule (same as the rasterizer): per-point registration state is
CHANNEL-FIRST.  The target stores points (3, T) and covariance components
(6, T) so the per-iteration correspondence fetch is ONE (9, T) lane
gather (a row gather of (T, 3, 3) measured ~8x slower), and the whole
Gauss-Newton accumulation is component arithmetic on (S,) arrays — no
(S, 3, 3) buffers, whose trailing 3x3 pads to the (8, 128) TPU tile.

All shapes are static; invalid slots ride along with zero weight.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GICPConfig
from ..utils.se3 import se3_exp
from .covariance import (cov_to_quat_scale, estimate_covariances,
                         quat_scale_to_reg_cov6, regularize_plane)
from .knn import knn_search

_BIG = 3.4e38


def _pad_lanes(n: int, granule: int = 4096) -> int:
    return -(-n // granule) * granule


class GICPTarget(NamedTuple):
    """Fixed-capacity target (map) cloud with registration covariances.

    Channel-first storage, padded along T to the NN-kernel block size:
      points (3, T); cov6 (6, T) rows [m00, m01, m02, m11, m12, m22]
      (plane-regularized); valid (T,); nn_bias (1, T) additive validity
      bias for the NN kernel: 0 on valid slots, +BIG on invalid ones.
    """

    points: jnp.ndarray
    cov6: jnp.ndarray
    valid: jnp.ndarray
    nn_bias: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.points.shape[1]


class GICPSource(NamedTuple):
    """Per-frame source cloud (trackable subset of the downsampled frame)."""

    points: jnp.ndarray  # (S, 3) camera-frame
    cov6: jnp.ndarray  # (6, S) plane-regularized components, camera-frame
    quat: jnp.ndarray  # (S, 4) xyzw of raw covariance eigenbasis
    scales: jnp.ndarray  # (S, 3) sqrt raw eigenvalues
    valid: jnp.ndarray  # (S,) bool


def empty_target(capacity: int) -> GICPTarget:
    tc = _pad_lanes(capacity)
    cov6 = jnp.zeros((6, tc), jnp.float32)
    cov6 = cov6.at[0].set(1.0).at[3].set(1.0).at[5].set(1.0)  # identity
    return GICPTarget(points=jnp.zeros((3, tc), jnp.float32),
                      cov6=cov6,
                      valid=jnp.zeros((tc,), bool),
                      nn_bias=jnp.full((1, tc), _BIG, jnp.float32))


def _cov_mat_to6(cov: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) symmetric -> (6, N) components."""
    return jnp.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                      cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], axis=0)


def _build_target(points_nc: jnp.ndarray, cov6: jnp.ndarray,
                  valid: jnp.ndarray, capacity: int | None) -> GICPTarget:
    """points_nc (P, 3), cov6 (6, P), valid (P,) -> padded GICPTarget."""
    p = points_nc.shape[0]
    tc = _pad_lanes(capacity if capacity is not None else p)
    assert tc >= p, (p, tc)
    pts = jnp.zeros((3, tc), jnp.float32).at[:, :p].set(points_nc.T)
    c6 = jnp.zeros((6, tc), jnp.float32)
    c6 = c6.at[0].set(1.0).at[3].set(1.0).at[5].set(1.0)
    c6 = c6.at[:, :p].set(cov6)
    v = jnp.zeros((tc,), bool).at[:p].set(valid)
    bias = jnp.where(v[None, :], 0.0, _BIG)
    return GICPTarget(points=pts, cov6=c6, valid=v, nn_bias=bias)


def make_source(points: jnp.ndarray, valid: jnp.ndarray,
                cfg: GICPConfig,
                trackable: jnp.ndarray | None = None,
                grid: tuple[int, int] | None = None,
                use_pallas: bool | None = None) -> GICPSource:
    """Estimate source covariances (the fork's set_source_filter +
    calculate covariance path, mp_Tracker.py:191-195).

    Covariances are estimated among `valid` points (all non-zero-depth
    samples — they all become gaussians and need quat/scale inits), while
    `trackable` (valid & z <= depth_trunc) gates which points participate
    in registration; the reference's source filter plays both roles at
    once because Replica's depth_trunc leaves the sets nearly identical.

    `grid` = (gh, gw) row-major grid dims of the downsampled frame;
    with cfg.source_knn == "grid" the neighbour search is the O(S)
    image-window one (knn_search_grid) instead of the exact O(S^2).
    """
    if trackable is None:
        trackable = valid
    if grid is not None and cfg.source_knn == "grid":
        from .knn import knn_search_grid, resolve_grid_span
        span = resolve_grid_span(cfg.k_neighbors, cfg.grid_knn_span)
        idx, sqd = knn_search_grid(points, valid, grid[0], grid[1],
                                   k=cfg.k_neighbors, span=span)
    else:
        idx, sqd = knn_search(points, points, valid, k=cfg.k_neighbors,
                              use_pallas=use_pallas)
    cov_raw = estimate_covariances(points, idx, valid, neighbor_sqd=sqd,
                                   max_dist=cfg.knn_max_distance)
    quat, scales = cov_to_quat_scale(cov_raw)
    cov_reg = regularize_plane(cov_raw, cfg.plane_eps)
    return GICPSource(points=points, cov6=_cov_mat_to6(cov_reg), quat=quat,
                      scales=scales, valid=trackable)


def target_from_points(points: jnp.ndarray, valid: jnp.ndarray,
                       cfg: GICPConfig, capacity: int | None = None,
                       use_pallas: bool | None = None):
    """Frame-0 target: covariances from kNN over the (already
    world-transformed) first cloud.  Also returns the raw-covariance
    (quat, scale) pairs used to seed the first gaussians.

    (mp_Tracker.py:157-169)."""
    idx, sqd = knn_search(points, points, valid, k=cfg.k_neighbors,
                          use_pallas=use_pallas)
    cov_raw = estimate_covariances(points, idx, valid, neighbor_sqd=sqd,
                                   max_dist=cfg.knn_max_distance)
    quat, scales = cov_to_quat_scale(cov_raw)
    cov_reg = regularize_plane(cov_raw, cfg.plane_eps)
    target = _build_target(points, _cov_mat_to6(cov_reg), valid, capacity)
    return target, quat, scales


def target_from_gaussians(xyz: jnp.ndarray, quat: jnp.ndarray,
                          scales: jnp.ndarray, valid: jnp.ndarray,
                          cfg: GICPConfig,
                          capacity: int | None = None) -> GICPTarget:
    """Covariance sharing, map -> tracker (set_target_covariances_fromqs,
    mp_Tracker.py:286-288): optimized gaussian rotations/scales become the
    registration covariances; no kNN recomputation."""
    cov6 = quat_scale_to_reg_cov6(quat, scales, cfg.plane_eps)
    return _build_target(xyz, cov6, valid, capacity)


def _nn_target(p: jnp.ndarray, target: GICPTarget, use_pallas=None):
    """1-NN of (S, 3) world points in the target; prefetched ref norms."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .nn_pallas import nn_search_pre
        return nn_search_pre(p, target.points, target.nn_bias)
    from .knn import nn_search
    return nn_search(p, target.points.T, target.valid, use_pallas=False)


def _rotate_cov6(R: jnp.ndarray, c6: jnp.ndarray):
    """(R Sigma R^T) components from (6, S) components and 3x3 R."""
    c00, c01, c02, c11, c12, c22 = c6
    r = R

    def rowdot(wa, wb, wc):
        m0 = wa * c00 + wb * c01 + wc * c02
        m1 = wa * c01 + wb * c11 + wc * c12
        m2 = wa * c02 + wb * c12 + wc * c22
        return m0, m1, m2

    m0 = rowdot(r[0, 0], r[0, 1], r[0, 2])
    m1 = rowdot(r[1, 0], r[1, 1], r[1, 2])
    m2 = rowdot(r[2, 0], r[2, 1], r[2, 2])

    def coldot(m, wa, wb, wc):
        return m[0] * wa + m[1] * wb + m[2] * wc

    return (coldot(m0, r[0, 0], r[0, 1], r[0, 2]),
            coldot(m0, r[1, 0], r[1, 1], r[1, 2]),
            coldot(m0, r[2, 0], r[2, 1], r[2, 2]),
            coldot(m1, r[1, 0], r[1, 1], r[1, 2]),
            coldot(m1, r[2, 0], r[2, 1], r[2, 2]),
            coldot(m2, r[2, 0], r[2, 1], r[2, 2]))


def _chol_solve6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled scalar Cholesky solve for the 6x6 Gauss-Newton system.

    jnp.linalg.solve lowers to a pivoted LU that costs milliseconds on TPU
    for a tiny system; H is SPD (+ damping), so an unrolled Cholesky in
    pure scalar ops is exact and effectively free."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _inv3x3_sym6(b00, b01, b02, b11, b12, b22):
    """Cofactor inverse of symmetric 3x3 given as components."""
    A = b11 * b22 - b12 * b12
    B = b02 * b12 - b01 * b22
    C = b01 * b12 - b02 * b11
    det = b00 * A + b01 * B + b02 * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    D = b00 * b22 - b02 * b02
    E = b01 * b02 - b00 * b12
    F = b00 * b11 - b01 * b01
    return (A * inv_det, B * inv_det, C * inv_det, D * inv_det,
            E * inv_det, F * inv_det)


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def gicp_align(source: GICPSource, target: GICPTarget, init_T: jnp.ndarray,
               cfg: GICPConfig, use_pallas: bool | None = None,
               init_T2: jnp.ndarray | None = None):
    """Align source onto target starting from init_T (camera-to-world).

    `use_pallas` gates the Pallas 1-NN kernel.  None = key off the
    process default backend; pass an explicit value when the align runs
    on a mesh whose devices differ from the default backend (the 8-CPU
    dryrun mesh in a process whose default backend is the TPU plugin —
    the Pallas kernel cannot lower there).

    `init_T2`: optional constant-velocity seed (the adaptive motion
    model, GICPConfig.motion_model == "adaptive").  ONE loop runs per
    frame; the seed is init_T2 when the predicted inter-frame rotation
    (the init_T -> init_T2 angle) exceeds cfg.adaptive_trigger_deg,
    else init_T.  Smooth frames therefore track bit-identically to the
    constant-position reference (mp_Tracker.py:197) at zero extra cost,
    while rotation-heavy frames get the constant-velocity basin
    (4x-rotation stress: CP 12.0 cm, CV 3.1 cm).  Magnitude gating —
    not result judging — is deliberate, twice over: (a) always seeding
    from CV lets extrapolation errors compound frame-over-frame through
    the velocity estimate (measured 0.16 -> 16.8 cm over 30 smooth
    sparse frames); (b) running BOTH loops and keeping the
    better-scoring pose was measured unreliable with every geometry
    score tried (one-step post-error, converged Mahalanobis, trimmed
    point-to-point with outlier fraction): under fast rotation the
    mis-tracked pose slides along scene planes into configurations
    those scores rate as well as the truth (probe: picking by trimmed
    score landed at 14.3 cm, WORSE than pure CP).

    Returns (T, n_iters): the optimized 4x4 transform mapping source
    (camera) points into the target (world) frame.
    """
    sq_gate = cfg.max_correspondence_distance**2
    tgt9 = jnp.concatenate([target.points, target.cov6], axis=0)  # (9, T)

    def gn_step(T):
        R = T[:3, :3]
        p = source.points @ R.T + T[:3, 3]        # (S, 3) transformed (MXU)
        idx, sqd = _nn_target(p, target, use_pallas=use_pallas)
        w = (source.valid & (sqd < sq_gate)).astype(jnp.float32)

        g9 = tgt9[:, idx]                         # ONE (9, S) lane gather
        ex = g9[0] - p[:, 0]
        ey = g9[1] - p[:, 1]
        ez = g9[2] - p[:, 2]

        # M = inv(t_cov + R Cs R^T), weighted by w — all component math
        rc = _rotate_cov6(R, source.cov6)
        m00, m01, m02, m11, m12, m22 = _inv3x3_sym6(
            g9[3] + rc[0], g9[4] + rc[1], g9[5] + rc[2],
            g9[6] + rc[3], g9[7] + rc[4], g9[8] + rc[5])
        m00, m01, m02 = m00 * w, m01 * w, m02 * w
        m11, m12, m22 = m11 * w, m12 * w, m22 * w

        px, py, pz = p[:, 0], p[:, 1], p[:, 2]
        # B = A^T M with A = skew(p) (columns u_i), M columns Mc_j:
        b00 = pz * m01 - py * m02
        b01 = pz * m11 - py * m12
        b02 = pz * m12 - py * m22
        b10 = -pz * m00 + px * m02
        b11 = -pz * m01 + px * m12
        b12 = -pz * m02 + px * m22
        b20 = py * m00 - px * m01
        b21 = py * m01 - px * m11
        b22 = py * m02 - px * m12

        # H00 = A^T M A (symmetric): row i of B times column j of A
        h00_00 = b01 * pz - b02 * py
        h00_01 = -b00 * pz + b02 * px
        h00_02 = b00 * py - b01 * px
        h00_11 = -b10 * pz + b12 * px
        h00_12 = b10 * py - b11 * px
        h00_22 = b20 * py - b21 * px

        def s(x):
            return jnp.sum(x)

        H00 = jnp.array([[s(h00_00), s(h00_01), s(h00_02)],
                         [s(h00_01), s(h00_11), s(h00_12)],
                         [s(h00_02), s(h00_12), s(h00_22)]])
        H01 = -jnp.array([[s(b00), s(b01), s(b02)],
                          [s(b10), s(b11), s(b12)],
                          [s(b20), s(b21), s(b22)]])
        H11 = jnp.array([[s(m00), s(m01), s(m02)],
                         [s(m01), s(m11), s(m12)],
                         [s(m02), s(m12), s(m22)]])
        g0 = jnp.array([s(b00 * ex + b01 * ey + b02 * ez),
                        s(b10 * ex + b11 * ey + b12 * ez),
                        s(b20 * ex + b21 * ey + b22 * ez)])
        g1 = -jnp.array([s(m00 * ex + m01 * ey + m02 * ez),
                         s(m01 * ex + m11 * ey + m12 * ez),
                         s(m02 * ex + m12 * ey + m22 * ez)])
        H = jnp.block([[H00, H01], [H01.T, H11]])
        g = jnp.concatenate([g0, g1])
        H = H + cfg.lm_init_lambda * jnp.trace(H) * jnp.eye(6, dtype=H.dtype)
        delta = _chol_solve6(H, -g)
        if cfg.degeneracy_thresh > 0.0:
            # solution remapping (Zhang & Kaess 2016): directions of H
            # with eigenvalue < thresh * max are unobservable from the
            # current geometry (single-wall views) — zero the update
            # there so the pose HOLDS the motion-model seed instead of
            # sliding along the scene plane (GICPConfig.degeneracy_thresh
            # has the measured failure this fixes)
            evals, evecs = jnp.linalg.eigh(H)
            keep = (evals >= cfg.degeneracy_thresh * evals[-1]
                    ).astype(delta.dtype)
            delta = evecs @ (keep * (evecs.T @ delta))
        T_new = se3_exp(delta) @ T
        return T_new, delta, idx, sqd

    def cond(state):
        _, i, converged, _, _ = state
        return (i < cfg.max_iterations) & (~converged)

    def body(state):
        T, i, _, _, _ = state
        T_new, delta, idx, sqd = gn_step(T)
        rot_ok = jnp.max(jnp.abs(delta[:3])) < cfg.rotation_epsilon
        trn_ok = jnp.max(jnp.abs(delta[3:])) < cfg.transformation_epsilon
        return T_new, i + 1, rot_ok & trn_ok, idx, sqd

    S = source.points.shape[0]

    def run_loop(T0):
        init = (T0.astype(jnp.float32), jnp.int32(0), jnp.bool_(False),
                jnp.zeros((S,), jnp.int32),
                jnp.full((S,), _BIG, jnp.float32))
        return jax.lax.while_loop(cond, body, init)

    T0 = init_T.astype(jnp.float32)
    if init_T2 is not None:
        # SEED SWITCH by predicted inter-frame rotation — the angle of
        # the CV extrapolation init_T -> init_T2, known before any
        # alignment runs.  Measured on the 4x-rotation stress
        # (~4.6 deg/frame): CP 12.0 cm, CV 3.1 cm, and every
        # result-quality judge tried (one-step post-error, converged
        # Mahalanobis, trimmed point-to-point) picked wrong often enough
        # to land at 14 cm — the aliased pose slides along planes into a
        # configuration geometry-only scores cannot distinguish.  The
        # smooth orbit (~1.15 deg/frame) measured CP at mm-level while
        # always-CV compounds extrapolation error through the velocity
        # estimate (0.16 -> 16.8 cm over 30 frames), so the magnitude
        # gate is the one signal that separates the regimes reliably.
        R1, R2 = init_T[:3, :3], init_T2[:3, :3]
        tr_rel = jnp.trace(R1.T @ R2)
        cos_half = jnp.sqrt(jnp.maximum(1.0 + tr_rel, 1e-12)) * 0.5
        pred_deg = 2.0 * jnp.degrees(
            jnp.arccos(jnp.clip(cos_half, -1.0, 1.0)))
        T0 = jnp.where(pred_deg > cfg.adaptive_trigger_deg,
                       init_T2.astype(jnp.float32), T0)
    T, n_iters, _, idx, sqd = run_loop(T0)
    # idx/sqd are the LAST linearization's correspondences — what
    # fast_gicp's get_source_correspondence returns after align
    # (mp_Tracker.py:231); reusing them saves the extra 1-NN pass
    return T, n_iters, idx, sqd


@partial(jax.jit, static_argnames=("use_pallas",))
def source_correspondences(T: jnp.ndarray, source_points: jnp.ndarray,
                           target: GICPTarget,
                           use_pallas: bool | None = None):
    """Squared NN distance of each (transformed) source point in the target —
    the fork's get_source_correspondence (mp_Tracker.py:231), which feeds the
    keyframe overlap ratio and the overlap dedup.

    `use_pallas` follows the gicp_align convention (ADVICE r3): None keys
    off the process default backend; pass False explicitly when running
    on a CPU mesh under a TPU-plugin process."""
    p = source_points @ T[:3, :3].T + T[:3, 3]
    return _nn_target(p, target, use_pallas=use_pallas)
