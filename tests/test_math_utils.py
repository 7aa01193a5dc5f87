"""Unit tests for quaternion / SE(3) / SH / loss math vs float64 numpy golden
values (SURVEY §4.1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_icp_slam_tpu.utils.quat import (quat_multiply, quat_normalize,
                                        quat_to_rotmat, rotmat_to_quat)
from gs_icp_slam_tpu.utils.se3 import se3_exp, so3_exp, invert_se3, transform_points
from gs_icp_slam_tpu.utils.sh import eval_sh, rgb_to_sh, sh_to_rgb, C0
from gs_icp_slam_tpu.utils.losses import l1_masked, ssim, psnr


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def scipy_like_rotmat(q):
    """Reference xyzw quat -> R (float64), formula from general_utils.py."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class TestQuat:
    def test_quat_to_rotmat_matches_reference_formula(self):
        qs = random_quats(64)
        R = np.asarray(quat_to_rotmat(jnp.asarray(qs, jnp.float32)))
        for i in range(64):
            np.testing.assert_allclose(R[i], scipy_like_rotmat(qs[i]), atol=1e-5)

    def test_rotmat_roundtrip(self):
        qs = random_quats(256, seed=1)
        R = quat_to_rotmat(jnp.asarray(qs, jnp.float32))
        q2 = np.asarray(rotmat_to_quat(R))
        # q and -q are the same rotation
        for i in range(256):
            d = min(np.linalg.norm(q2[i] - qs[i]), np.linalg.norm(q2[i] + qs[i]))
            assert d < 1e-4

    def test_rotmat_roundtrip_edge_cases(self):
        # identity, 180-degree rotations about each axis
        mats = [np.eye(3)]
        for axis in range(3):
            d = -np.ones(3)
            d[axis] = 1.0
            mats.append(np.diag(d))
        for R in mats:
            q = rotmat_to_quat(jnp.asarray(R, jnp.float32))
            R2 = np.asarray(quat_to_rotmat(q))
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_multiply_is_rotation_composition(self):
        qa = random_quats(32, seed=2)
        qb = random_quats(32, seed=3)
        q_ab = quat_multiply(jnp.asarray(qa, jnp.float32), jnp.asarray(qb, jnp.float32))
        R_ab = np.asarray(quat_to_rotmat(q_ab))
        for i in range(32):
            expected = scipy_like_rotmat(qa[i]) @ scipy_like_rotmat(qb[i])
            np.testing.assert_allclose(R_ab[i], expected, atol=1e-5)

    def test_quat_multiply_matches_reference_tracker_formula(self):
        """mp_Tracker.quaternion_multiply(q1, Q2) row-for-row."""
        q1 = random_quats(1, seed=4)[0]
        Q2 = random_quats(16, seed=5)
        x0, y0, z0, w0 = q1
        expected = np.array([
            w0 * Q2[:, 0] + x0 * Q2[:, 3] + y0 * Q2[:, 2] - z0 * Q2[:, 1],
            w0 * Q2[:, 1] + y0 * Q2[:, 3] + z0 * Q2[:, 0] - x0 * Q2[:, 2],
            w0 * Q2[:, 2] + z0 * Q2[:, 3] + x0 * Q2[:, 1] - y0 * Q2[:, 0],
            w0 * Q2[:, 3] - x0 * Q2[:, 0] - y0 * Q2[:, 1] - z0 * Q2[:, 2],
        ]).T
        got = np.asarray(quat_multiply(jnp.asarray(q1, jnp.float32),
                                       jnp.asarray(Q2, jnp.float32)))
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestSE3:
    def test_so3_exp_small_angle(self):
        w = jnp.array([1e-8, -1e-8, 1e-9], jnp.float32)
        R = np.asarray(so3_exp(w))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_se3_exp_matches_expm(self):
        from scipy.linalg import expm
        rng = np.random.default_rng(7)
        for _ in range(16):
            xi = rng.normal(size=6) * 0.5
            T = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32)))
            hat = np.zeros((4, 4))
            hat[:3, :3] = np.array([[0, -xi[2], xi[1]],
                                    [xi[2], 0, -xi[0]],
                                    [-xi[1], xi[0], 0]])
            hat[:3, 3] = xi[3:]
            np.testing.assert_allclose(T, expm(hat), atol=2e-4)

    def test_invert_roundtrip(self):
        xi = jnp.asarray(np.random.default_rng(8).normal(size=6), jnp.float32)
        T = se3_exp(xi)
        eye = np.asarray(invert_se3(T) @ T)
        np.testing.assert_allclose(eye, np.eye(4), atol=1e-6)

    def test_transform_points(self):
        T = se3_exp(jnp.asarray([0.1, 0.2, -0.1, 1.0, 2.0, 3.0], jnp.float32))
        pts = jnp.asarray(np.random.default_rng(9).normal(size=(10, 3)), jnp.float32)
        got = transform_points(T, pts)
        Tn = np.asarray(T)
        expected = np.asarray(pts) @ Tn[:3, :3].T + Tn[:3, 3]
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


class TestSH:
    def test_deg0_constant(self):
        sh = jnp.ones((5, 3, 1))
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray([[0.1, 0.5, 0.9]])
        np.testing.assert_allclose(np.asarray(sh_to_rgb(rgb_to_sh(rgb))),
                                   np.asarray(rgb), atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_higher_degrees_run_and_integrate(self, deg):
        # SH basis functions should average ~DC over many random directions
        rng = np.random.default_rng(deg)
        n = 20000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        sh = np.zeros((n, 1, (deg + 1) ** 2), np.float32)
        sh[..., deg**2] = 1.0  # a pure higher-degree coefficient
        out = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(v, jnp.float32)))
        assert abs(out.mean()) < 0.02  # zero-mean over the sphere


class TestLosses:
    def test_l1_masked_zero_gt_excluded(self):
        pred = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        gt = jnp.asarray([[0.0, 1.0], [0.0, 5.0]])
        m, mean = l1_masked(pred, gt)
        np.testing.assert_allclose(np.asarray(m), [[0.0, 1.0], [0.0, 1.0]])
        assert float(mean) == pytest.approx(0.5)

    def test_ssim_identical_images(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0.1, 1.0, size=(3, 32, 32)), jnp.float32)
        _, s = ssim(img, img)
        assert float(s) > 0.99

    def test_ssim_matches_torch_reference(self):
        """Golden check against the reference's torch implementation."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(4)
        a = rng.uniform(0.0, 1.0, size=(3, 24, 24)).astype(np.float32)
        b = rng.uniform(0.1, 1.0, size=(3, 24, 24)).astype(np.float32)

        # torch-side (reference utils/loss_utils.py)
        def torch_ssim(img, gt):
            img = torch.where(gt != 0, img, torch.zeros_like(img))
            window_size, sigma, channel = 11, 1.5, 3
            xs = torch.arange(window_size).float()
            g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
            g = g / g.sum()
            w2 = (g[:, None] @ g[None, :]).expand(channel, 1, window_size, window_size)
            pad = window_size // 2
            mu1 = F.conv2d(img[None], w2, padding=pad, groups=channel)
            mu2 = F.conv2d(gt[None], w2, padding=pad, groups=channel)
            s1 = F.conv2d((img * img)[None], w2, padding=pad, groups=channel) - mu1**2
            s2 = F.conv2d((gt * gt)[None], w2, padding=pad, groups=channel) - mu2**2
            s12 = F.conv2d((img * gt)[None], w2, padding=pad, groups=channel) - mu1 * mu2
            C1, C2 = 0.01**2, 0.03**2
            smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
            return smap.mean().item()

        expected = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        _, got = ssim(jnp.asarray(a), jnp.asarray(b))
        assert float(got) == pytest.approx(expected, abs=1e-4)

    def test_psnr_known_value(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)
