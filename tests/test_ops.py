"""Tests for eigh3x3, kNN, covariance estimation, and G-ICP alignment on
synthetic rigid-motion data (SURVEY §4.1-4.2)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gs_icp_slam_tpu.ops.eigh3 import eigh3x3, eigvals3x3
from gs_icp_slam_tpu.ops.knn import nn_search, knn_search
from gs_icp_slam_tpu.ops.covariance import (cov_to_quat_scale,
                                            estimate_covariances,
                                            quat_scale_to_cov,
                                            quat_scale_to_reg_cov,
                                            regularize_plane)
from gs_icp_slam_tpu.ops.gicp import (GICPTarget, gicp_align, make_source,
                                      target_from_gaussians,
                                      target_from_points)
from gs_icp_slam_tpu.config import GICPConfig
from gs_icp_slam_tpu.utils.se3 import se3_exp


def random_spd(n, seed=0, aniso=10.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, 3, 3))
    q, _ = np.linalg.qr(A)
    lam = rng.uniform(0.1, aniso, size=(n, 3))
    return np.einsum("nij,nj,nkj->nik", q, lam, q).astype(np.float32)


class TestEigh3:
    def test_eigvals_match_numpy(self):
        C = random_spd(200)
        got = np.asarray(eigvals3x3(jnp.asarray(C)))
        expected = np.linalg.eigvalsh(C.astype(np.float64))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_full_decomposition_reconstructs(self):
        C = random_spd(200, seed=1)
        vals, vecs = eigh3x3(jnp.asarray(C))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        rec = np.einsum("nij,nj,nkj->nik", vecs, vals, vecs)
        np.testing.assert_allclose(rec, C, rtol=5e-3, atol=5e-3)
        # orthonormal, right-handed
        eye = np.einsum("nij,nkj->nik", vecs, vecs)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
        assert np.all(np.linalg.det(vecs) > 0.9)

    def test_degenerate_isotropic(self):
        C = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
        vals, vecs = eigh3x3(C)
        np.testing.assert_allclose(np.asarray(vals), 2.5, atol=1e-5)
        eye = np.einsum("nij,nkj->nik", np.asarray(vecs), np.asarray(vecs))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)

    def test_degenerate_planar(self):
        # two equal large eigenvalues (disc), tiny third — the G-ICP shape
        rng = np.random.default_rng(3)
        A = rng.normal(size=(8, 3, 3))
        q, _ = np.linalg.qr(A)
        lam = np.stack([np.full(8, 1.0), np.full(8, 1.0), np.full(8, 1e-3)], axis=-1)
        C = np.einsum("nij,nj,nkj->nik", q, lam, q).astype(np.float32)
        vals, vecs = eigh3x3(jnp.asarray(C))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        np.testing.assert_allclose(np.sort(vals, axis=-1), np.sort(lam, axis=-1),
                                   rtol=1e-3, atol=1e-4)
        rec = np.einsum("nij,nj,nkj->nik", vecs, vals, vecs)
        np.testing.assert_allclose(rec, C, atol=5e-3)


class TestKNN:
    def test_nn_search_vs_numpy(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(100, 3)).astype(np.float32)
        r = rng.normal(size=(300, 3)).astype(np.float32)
        valid = np.ones(300, bool)
        valid[::7] = False
        idx, sqd = nn_search(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), chunk=64)
        d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
        d2[:, ~valid] = np.inf
        np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))
        np.testing.assert_allclose(np.asarray(sqd), d2.min(1), rtol=1e-4, atol=1e-5)

    def test_nn_search_pallas_matches(self):
        """Pallas 1-NN kernel (interpret mode on CPU) vs brute force."""
        rng = np.random.default_rng(3)
        q = rng.normal(size=(70, 3)).astype(np.float32)
        r = rng.normal(size=(300, 3)).astype(np.float32)
        valid = np.ones(300, bool)
        valid[::5] = False
        idx, sqd = nn_search(jnp.asarray(q), jnp.asarray(r),
                             jnp.asarray(valid), use_pallas=True)
        d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
        d2[:, ~valid] = np.inf
        np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))
        np.testing.assert_allclose(np.asarray(sqd), d2.min(1), rtol=1e-4,
                                   atol=1e-5)

    def test_knn_search_pallas_matches_numpy(self):
        """Pallas k-NN kernel (interpret on CPU) vs numpy partial sort."""
        from gs_icp_slam_tpu.ops.nn_pallas import knn_search_pallas

        rng = np.random.default_rng(9)
        q = rng.normal(size=(130, 3)).astype(np.float32)
        r = rng.normal(size=(700, 3)).astype(np.float32)
        valid = np.ones(700, bool)
        valid[::7] = False
        idx, sqd = knn_search_pallas(jnp.asarray(q), jnp.asarray(r),
                                     jnp.asarray(valid), k=8)
        d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
        d2[:, ~valid] = np.inf
        ref_sqd = np.sort(d2, axis=1)[:, :8]
        np.testing.assert_allclose(np.asarray(sqd), ref_sqd, rtol=1e-4,
                                   atol=1e-5)
        # gathered neighbor distances must equal the reported ones
        got = np.take_along_axis(d2, np.asarray(idx), axis=1)
        np.testing.assert_allclose(got, np.asarray(sqd), rtol=1e-4,
                                   atol=1e-5)

    def test_nn_search_pallas_all_invalid(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(8, 3)).astype(np.float32)
        r = rng.normal(size=(64, 3)).astype(np.float32)
        _, sqd = nn_search(jnp.asarray(q), jnp.asarray(r),
                           jnp.zeros(64, bool), use_pallas=True)
        assert float(np.asarray(sqd).min()) > 1e30

    def test_knn_includes_self(self):
        rng = np.random.default_rng(1)
        p = rng.normal(size=(50, 3)).astype(np.float32)
        idx, sqd = knn_search(jnp.asarray(p), jnp.asarray(p), jnp.ones(50, bool),
                              k=4, q_chunk=16)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(50))
        np.testing.assert_allclose(np.asarray(sqd)[:, 0], 0.0, atol=1e-5)

    def test_knn_vs_numpy(self):
        rng = np.random.default_rng(2)
        p = rng.normal(size=(64, 3)).astype(np.float32)
        idx, _ = knn_search(jnp.asarray(p), jnp.asarray(p), jnp.ones(64, bool),
                            k=5, q_chunk=64)
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
        expected = np.argsort(d2, axis=1)[:, :5]
        got = np.sort(np.asarray(idx), axis=1)
        np.testing.assert_array_equal(got, np.sort(expected, axis=1))


class TestCovariance:
    def test_estimate_covariance_plane(self):
        # points on a plane -> smallest eigenvalue ~0, normal = plane normal
        rng = np.random.default_rng(4)
        n = 500
        pts = np.zeros((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-1, 1, n)
        pts[:, 1] = rng.uniform(-1, 1, n)
        idx, _ = knn_search(jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool), k=20)
        cov = estimate_covariances(jnp.asarray(pts), idx, jnp.ones(n, bool))
        vals = np.asarray(eigvals3x3(cov))
        assert np.all(vals[:, 0] < 1e-6)
        assert np.all(vals[:, 2] > 1e-4)

    def test_knn_max_distance_gates_covariance(self):
        # two clusters 10 apart; with a tight distance cap, the far cluster
        # must not enter the near points' covariances (mp_Tracker.py:110)
        rng = np.random.default_rng(11)
        near = rng.normal(0, 0.01, (10, 3)).astype(np.float32)
        far = (rng.normal(0, 0.01, (10, 3)) + 10.0).astype(np.float32)
        pts = jnp.asarray(np.concatenate([near, far]))
        valid = jnp.ones(20, bool)
        idx, sqd = knn_search(pts, pts, valid, k=20)  # all points neighbors
        cov_uncapped = np.asarray(estimate_covariances(
            pts, idx, valid, neighbor_sqd=sqd, max_dist=99999.0))
        cov_capped = np.asarray(estimate_covariances(
            pts, idx, valid, neighbor_sqd=sqd, max_dist=1.0))
        # uncapped: inter-cluster spread dominates (variance ~ 25)
        assert np.trace(cov_uncapped[0]) > 10.0
        # capped: only the local cluster (variance ~ 1e-4)
        assert np.trace(cov_capped[0]) < 1e-2
        # default (None) == uncapped
        cov_none = np.asarray(estimate_covariances(pts, idx, valid))
        np.testing.assert_allclose(cov_none, cov_uncapped, atol=1e-6)

    def test_regularize_plane_eigenvalues(self):
        C = random_spd(32, seed=5)
        reg = regularize_plane(jnp.asarray(C), eps=1e-3)
        vals = np.sort(np.linalg.eigvalsh(np.asarray(reg).astype(np.float64)), axis=-1)
        np.testing.assert_allclose(vals[:, 0], 1e-3, rtol=1e-2)
        np.testing.assert_allclose(vals[:, 1:], 1.0, rtol=1e-2)

    def test_quat_scale_roundtrip(self):
        C = random_spd(64, seed=6)
        q, s = cov_to_quat_scale(jnp.asarray(C))
        rec = np.asarray(quat_scale_to_cov(q, s))
        np.testing.assert_allclose(rec, C, rtol=2e-2, atol=2e-2)

    def test_quat_scale_to_reg_cov_matches_regularize(self):
        C = random_spd(64, seed=7)
        q, s = cov_to_quat_scale(jnp.asarray(C))
        got = np.asarray(quat_scale_to_reg_cov(q, s, eps=1e-3))
        expected = np.asarray(regularize_plane(jnp.asarray(C), eps=1e-3))
        np.testing.assert_allclose(got, expected, atol=5e-3)


def make_room_cloud(n=2000, seed=0):
    """Points on the walls of a box — plane-rich, like indoor RGB-D."""
    rng = np.random.default_rng(seed)
    per = n // 5
    pts = []
    # floor, two walls, ceiling, back wall
    for axis, offset in [(2, 0.0), (0, -2.0), (0, 2.0), (2, 4.0), (1, 2.0)]:
        p = rng.uniform(-2, 2, size=(per, 3))
        p[:, axis] = offset + rng.normal(0, 0.002, per)  # 2mm sensor noise
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


class TestGICP:
    def test_align_recovers_rigid_motion(self):
        cfg = GICPConfig(max_correspondence_distance=0.5, k_neighbors=10)
        target_pts = make_room_cloud(2000)
        xi = np.array([0.02, -0.015, 0.01, 0.05, -0.03, 0.04], np.float32)
        T_true = np.asarray(se3_exp(jnp.asarray(xi)))
        # source = inverse-transformed target (so aligning source->target
        # should recover T_true)
        src = (target_pts - T_true[:3, 3]) @ T_true[:3, :3]
        valid = jnp.ones(len(src), bool)

        target, _, _ = target_from_points(jnp.asarray(target_pts), valid, cfg)
        source = make_source(jnp.asarray(src.astype(np.float32)), valid, cfg)
        T_est, n_iters, _, _ = gicp_align(source, target, jnp.eye(4), cfg)
        T_est = np.asarray(T_est)
        np.testing.assert_allclose(T_est[:3, 3], T_true[:3, 3], atol=2e-3)
        np.testing.assert_allclose(T_est[:3, :3], T_true[:3, :3], atol=2e-3)
        assert int(n_iters) < 64

    def test_covariance_sharing_matches_knn_recompute(self):
        """The paper's core claim (SURVEY §intro #3; mp_Tracker.py:286-288):
        feeding the tracker MAP-side quat/scale covariances
        (target_from_gaussians = set_target_covariances_fromqs) must give
        the same registration as recomputing target covariances by kNN on
        the same cloud (target_from_points) — the sharing skips work, not
        accuracy.  VERDICT r3 #7."""
        cfg = GICPConfig(max_correspondence_distance=0.5, k_neighbors=10)
        target_pts = make_room_cloud(2000, seed=3)
        valid = jnp.ones(len(target_pts), bool)

        # kNN-recomputed covariances AND their exported (quat, scale)
        # pairs — exactly what the map stores for each gaussian
        target_knn, quat, scales = target_from_points(
            jnp.asarray(target_pts), valid, cfg)
        # map->tracker injection path: rebuild covariances from the
        # stored quat/scale pairs (no kNN)
        target_fed = target_from_gaussians(jnp.asarray(target_pts), quat,
                                           scales, valid, cfg)

        # the injected covariances must BE the regularized kNN ones
        np.testing.assert_allclose(np.asarray(target_fed.cov6),
                                   np.asarray(target_knn.cov6), atol=5e-3)

        xi = np.array([0.02, -0.01, 0.015, 0.04, -0.02, 0.03], np.float32)
        T_true = np.asarray(se3_exp(jnp.asarray(xi)))
        src = ((target_pts - T_true[:3, 3]) @ T_true[:3, :3]).astype(
            np.float32)
        source = make_source(jnp.asarray(src), valid, cfg)

        T_knn, _, _, _ = gicp_align(source, target_knn, jnp.eye(4), cfg)
        T_fed, _, _, _ = gicp_align(source, target_fed, jnp.eye(4), cfg)
        T_knn, T_fed = np.asarray(T_knn), np.asarray(T_fed)
        # both recover the motion, and agree with each other tighter than
        # either agrees with ground truth
        np.testing.assert_allclose(T_knn[:3, 3], T_true[:3, 3], atol=2e-3)
        np.testing.assert_allclose(T_fed[:3, 3], T_true[:3, 3], atol=2e-3)
        np.testing.assert_allclose(T_fed[:3, 3], T_knn[:3, 3], atol=5e-4)
        np.testing.assert_allclose(T_fed[:3, :3], T_knn[:3, :3], atol=5e-4)

    def test_align_with_initial_guess_and_partial_overlap(self):
        cfg = GICPConfig(max_correspondence_distance=0.3, k_neighbors=10)
        target_pts = make_room_cloud(2500, seed=2)
        xi = np.array([0.01, 0.02, -0.01, 0.03, 0.02, -0.05], np.float32)
        T_true = np.asarray(se3_exp(jnp.asarray(xi)))
        src_full = (target_pts - T_true[:3, 3]) @ T_true[:3, :3]
        src = src_full[: 2000]  # partial overlap
        valid_t = jnp.ones(len(target_pts), bool)
        valid_s = jnp.ones(len(src), bool)
        target, _, _ = target_from_points(jnp.asarray(target_pts), valid_t, cfg)
        source = make_source(jnp.asarray(src.astype(np.float32)), valid_s, cfg)
        # init with identity (constant-position motion model)
        T_est, _, _, _ = gicp_align(source, target, jnp.eye(4), cfg)
        np.testing.assert_allclose(np.asarray(T_est)[:3, 3], T_true[:3, 3], atol=5e-3)


class TestGridKNN:
    """knn_search_grid vs the exact search on a grid-sampled smooth frame
    (the production source-covariance path, GICPConfig.source_knn)."""

    def _frame(self, gh=24, gw=32, seed=0):
        # smooth wavy depth surface sampled on a regular pixel grid,
        # like the downsample filter's output
        rng = np.random.default_rng(seed)
        u = np.linspace(-0.4, 0.4, gw, dtype=np.float32)
        v = np.linspace(-0.3, 0.3, gh, dtype=np.float32)
        uu, vv = np.meshgrid(u, v)  # (gh, gw), row-major like the filter
        z = 2.0 + 0.2 * np.sin(3 * uu) * np.cos(2 * vv)
        pts = np.stack([uu * z, vv * z, z], axis=-1).reshape(-1, 3)
        valid = np.ones(gh * gw, bool)
        # a hole of invalid depth + the borders exercise self-padding
        valid[rng.choice(gh * gw, 20, replace=False)] = False
        return (jnp.asarray(pts), jnp.asarray(valid), gh, gw)

    def test_matches_exact_on_smooth_surface(self):
        from gs_icp_slam_tpu.ops.knn import knn_search_grid
        pts, valid, gh, gw = self._frame()
        gi, gd = knn_search_grid(pts, valid, gh, gw, k=20, span=2)
        ei, ed = knn_search(pts, pts, valid, k=20)
        # neighbour SETS agree at nearly every INTERIOR point (at the
        # frame border the exact search reaches outside the window)
        interior = np.zeros((gh, gw), bool)
        interior[2:-2, 2:-2] = True
        agree = []
        for r in np.flatnonzero(interior.reshape(-1) & np.asarray(valid)):
            agree.append(len(set(np.asarray(gi[r]))
                             & set(np.asarray(ei[r]))) / 20.0)
        assert np.mean(agree) > 0.97, np.mean(agree)

    def test_covariances_match_exact(self):
        from gs_icp_slam_tpu.ops.knn import knn_search_grid
        pts, valid, gh, gw = self._frame()
        gi, gd = knn_search_grid(pts, valid, gh, gw, k=20, span=2)
        ei, ed = knn_search(pts, pts, valid, k=20)
        cg = np.asarray(estimate_covariances(pts, gi, valid))
        ce = np.asarray(estimate_covariances(pts, ei, valid))
        # interior rows (full window): covariances nearly identical
        interior = np.zeros((gh, gw), bool)
        interior[2:-2, 2:-2] = True
        rows = interior.reshape(-1) & np.asarray(valid)
        err = np.abs(cg[rows] - ce[rows]).max(axis=(1, 2))
        scale = np.abs(ce[rows]).max(axis=(1, 2)) + 1e-12
        assert np.quantile(err / scale, 0.95) < 0.05

    def test_missing_candidates_fall_back_to_self(self):
        from gs_icp_slam_tpu.ops.knn import knn_search_grid
        # one lonely valid point: every neighbour slot must be itself
        pts = jnp.asarray(np.random.default_rng(1).normal(
            size=(6 * 8, 3)).astype(np.float32))
        valid = jnp.zeros((48,), bool).at[20].set(True)
        gi, gd = knn_search_grid(pts, valid, 6, 8, k=9, span=1)
        assert np.asarray(gi[20][1:] == 20).all()
        assert np.asarray(gd[20][1:] > 1e37).all()

    def test_make_source_grid_mode(self):
        pts, valid, gh, gw = self._frame()
        cfg_g = GICPConfig(source_knn="grid")
        cfg_e = GICPConfig(source_knn="exact")
        sg = make_source(pts, valid, cfg_g, grid=(gh, gw))
        se = make_source(pts, valid, cfg_e, grid=(gh, gw))
        interior = np.zeros((gh, gw), bool)
        interior[2:-2, 2:-2] = True
        rows = interior.reshape(-1) & np.asarray(valid)
        dc = np.abs(np.asarray(sg.cov6[:, rows] - se.cov6[:, rows]))
        assert np.quantile(dc, 0.95) < 0.05, np.quantile(dc, 0.95)
