"""Rasterizer: dense-reference vs tiled-production agreement, gradients,
and the CUDA kernel semantics (alpha clamp, T_EPS early stop, depth channel,
radii/is_used contract of the fork, gaussian_renderer/__init__.py:86-94)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_icp_slam_tpu.ops.projection import project_gaussians, covariance_3d
from gs_icp_slam_tpu.ops.rasterize_ref import rasterize_dense
from gs_icp_slam_tpu.ops.rasterize import rasterize_tiled

W, H = 64, 48
FX = FY = 60.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def _scene(n=64, seed=0, spread=0.8):
    rng = np.random.default_rng(seed)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.uniform(-spread, spread, n)
    xyz[:, 1] = rng.uniform(-spread * 0.7, spread * 0.7, n)
    xyz[:, 2] = rng.uniform(1.2, 3.0, n)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scale = rng.uniform(0.02, 0.08, size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    sh = rng.uniform(-0.4, 0.4, size=(n, 1, 3)).astype(np.float32)
    live = np.ones((n,), bool)
    return tuple(map(jnp.asarray, (xyz, quat, scale, opacity, sh, live)))


W2C = jnp.eye(4)
BG = jnp.zeros((3,))


def _dense(xyz, quat, scale, opacity, sh, live, bg=BG, tile_span=7):
    # tile_span matches _tiled so the CUDA-style rect truncation agrees
    return rasterize_dense(xyz, quat, scale, opacity, sh, 0, W2C,
                           FX, FY, CX, CY, W, H, live, bg,
                           tile_span=tile_span)


def _tiled(xyz, quat, scale, opacity, sh, live, bg=BG, **kw):
    kw.setdefault("tile_span", 7)
    kw.setdefault("tile_cap", 128)
    kw.setdefault("visible_cap", 128)
    return rasterize_tiled(xyz, quat, scale, opacity, sh, W2C, live, bg,
                           FX, FY, CX, CY, sh_degree=0, width=W, height=H,
                           **kw)


def test_dense_renders_something():
    color, depth, radii, used = _dense(*_scene())
    assert color.shape == (3, H, W)
    assert depth.shape == (H, W)
    assert float(color.max()) > 0.01
    assert float(depth.max()) > 1.0
    assert int(jnp.sum(radii > 0)) > 0
    assert bool(used.any())


def test_tiled_matches_dense():
    scene = _scene(96, seed=1)
    c_d, d_d, r_d, u_d = _dense(*scene)
    out = _tiled(*scene)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(c_d),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(d_d),
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out.radii), np.asarray(r_d))


def test_tiled_matches_dense_nontrivial_pose():
    scene = _scene(96, seed=2)
    ang = 0.3
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = [0.1, -0.05, 0.2]
    w2c = jnp.asarray(w2c)
    xyz, quat, scale, opacity, sh, live = scene
    c_d, d_d, _, _ = rasterize_dense(xyz, quat, scale, opacity, sh, 0, w2c,
                                     FX, FY, CX, CY, W, H, live, BG,
                                     tile_span=7)
    out = rasterize_tiled(xyz, quat, scale, opacity, sh, w2c, live, BG,
                          FX, FY, CX, CY, sh_degree=0, width=W, height=H,
                          tile_span=7, tile_cap=128, visible_cap=128)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(c_d),
                               atol=2e-4)


def test_dead_slots_invisible():
    xyz, quat, scale, opacity, sh, live = _scene(64, seed=3)
    live = live.at[::2].set(False)
    c_all, *_ = _dense(xyz, quat, scale, opacity, sh, jnp.ones_like(live))
    c_live, _, radii, used = _dense(xyz, quat, scale, opacity, sh, live)
    assert not np.allclose(np.asarray(c_all), np.asarray(c_live))
    assert int(radii[0]) == 0 and not bool(used[0])
    out = _tiled(xyz, quat, scale, opacity, sh, live)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(c_live),
                               atol=2e-4)


def test_background_through_empty_pixels():
    scene = _scene(4, seed=4, spread=0.05)
    bg = jnp.array([0.2, 0.4, 0.6])
    color, *_ = _dense(*scene, bg=bg)
    corner = np.asarray(color[:, 0, 0])
    np.testing.assert_allclose(corner, np.asarray(bg), atol=1e-5)
    out = _tiled(*scene, bg=bg)
    np.testing.assert_allclose(np.asarray(out.color[:, 0, 0]),
                               np.asarray(bg), atol=1e-5)


def test_gradients_flow_and_match():
    scene = _scene(32, seed=5)
    xyz, quat, scale, opacity, sh, live = scene
    target = jnp.ones((3, H, W)) * 0.5

    def loss_dense(xyz, scale, opacity, sh):
        c, d, _, _ = _dense(xyz, quat, scale, opacity, sh, live)
        return jnp.mean((c - target) ** 2) + 0.1 * jnp.mean(d)

    def loss_tiled(xyz, scale, opacity, sh):
        out = _tiled(xyz, quat, scale, opacity, sh, live)
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.depth)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(xyz, scale, opacity, sh)
    gt = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(xyz, scale, opacity, sh)
    for a, b, name in zip(gd, gt, ["xyz", "scale", "opacity", "sh"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale_ref = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale_ref, a / scale_ref, atol=5e-3,
                                   err_msg=name)
    assert np.abs(np.asarray(gd[0])).max() > 0


def test_gradcheck_vs_numerical():
    """Central-difference check of the tiled renderer on a few coordinates."""
    scene = _scene(8, seed=6, spread=0.3)
    xyz, quat, scale, opacity, sh, live = scene

    def loss(op):
        out = _tiled(xyz, quat, scale, op, sh, live)
        return jnp.sum(out.color ** 2)

    g = np.asarray(jax.grad(loss)(opacity))
    eps = 1e-3
    for i in range(4):
        op_p = opacity.at[i].add(eps)
        op_m = opacity.at[i].add(-eps)
        num = (float(loss(op_p)) - float(loss(op_m))) / (2 * eps)
        assert abs(num - g[i]) < 5e-2 * max(1.0, abs(num)), (i, num, g[i])


def test_visible_cap_keeps_front():
    """Overflowing visible_cap must drop the FARTHEST splats — regardless
    of slot order (the scene is shuffled so index order != depth order)."""
    n = 32
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)  # scatter depths across slots
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = np.linspace(1.0, 5.0, n)[perm]  # all at screen center
    quat = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    scale = np.full((n, 3), 0.05, np.float32)
    opacity = np.full((n,), 0.9, np.float32)
    sh = np.zeros((n, 1, 3), np.float32)
    sh[np.argmin(xyz[:, 2])] = 1.0  # nearest is bright
    args = tuple(map(jnp.asarray, (xyz, quat, scale, opacity, sh)))
    live = jnp.ones((n,), bool)
    full = _tiled(*args, live, visible_cap=32)
    capped = _tiled(*args, live, visible_cap=8)
    # front splat saturates the center pixel: capping the tail is invisible
    cy, cxp = H // 2, W // 2
    np.testing.assert_allclose(np.asarray(capped.color[:, cy, cxp]),
                               np.asarray(full.color[:, cy, cxp]), atol=1e-3)
    # the cap overflow is REPORTED, not silent (VERDICT r1 item 4)
    n_vis = int(full.stats[0])
    assert int(capped.stats[1]) == max(n_vis - 8, 0)
    assert int(full.stats[1]) == 0


def test_tile_cap_overflow_reported():
    """Exceeding the per-tile list capacity increments stats[2]."""
    # pile many splats onto one tile
    n = 64
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = np.linspace(1.0, 2.0, n)
    quat = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    scale = np.full((n, 3), 0.02, np.float32)
    opacity = np.full((n,), 0.5, np.float32)
    sh = np.zeros((n, 1, 3), np.float32)
    args = tuple(map(jnp.asarray, (xyz, quat, scale, opacity, sh)))
    live = jnp.ones((n,), bool)
    out = _tiled(*args, live, tile_cap=8, visible_cap=128)
    assert int(out.stats[2]) > 0
    ok = _tiled(*args, live, tile_cap=128, visible_cap=128)
    assert int(ok.stats[2]) == 0


def test_tiled_matches_dense_at_production_caps():
    """Dense-oracle agreement at the PRODUCTION tile_span=3/tile_cap=256
    settings (config.py RenderConfig) on a denser scene: the caps must not
    change the image when they do not overflow (stats say they don't)."""
    scene = _scene(192, seed=11, spread=0.9)
    ref_color, ref_depth, _, _ = _dense(*scene, tile_span=3)
    out = _tiled(*scene, tile_span=3, tile_cap=256, visible_cap=256)
    assert int(out.stats[1]) == 0 and int(out.stats[2]) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref_color),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref_depth),
                               atol=2e-2)


def test_pallas_compositor_matches_xla():
    """Pallas tile compositor (interpret mode on CPU) vs the pure-XLA path."""
    scene = _scene(96, seed=7)
    ref = _tiled(*scene, use_pallas=False)
    out = _tiled(*scene, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.t_final),
                               np.asarray(ref.t_final), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out.is_used),
                                  np.asarray(ref.is_used))


def test_pallas_compositor_gradients_match():
    scene = _scene(48, seed=8)
    xyz, quat, scale, opacity, sh, live = scene
    target = jnp.ones((3, H, W)) * 0.5

    def loss(xyz, scale, opacity, sh, use_pallas):
        out = _tiled(xyz, quat, scale, opacity, sh, live,
                     use_pallas=use_pallas)
        return (jnp.mean((out.color - target) ** 2)
                + 0.1 * jnp.mean(out.depth) + 0.01 * jnp.mean(out.t_final))

    gx = jax.grad(partial(loss, use_pallas=False),
                  argnums=(0, 1, 2, 3))(xyz, scale, opacity, sh)
    gp = jax.grad(partial(loss, use_pallas=True),
                  argnums=(0, 1, 2, 3))(xyz, scale, opacity, sh)
    for a, b, name in zip(gx, gp, ["xyz", "scale", "opacity", "sh"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        scale_ref = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale_ref, a / scale_ref, atol=1e-3,
                                   err_msg=name)


def test_covariance_3d():
    q = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)),
                    dtype=jnp.float32)
    s = jnp.asarray(np.random.default_rng(1).uniform(0.1, 1.0, (5, 3)),
                    dtype=jnp.float32)
    cov = covariance_3d(q, s)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    np.testing.assert_allclose(np.sort(evals, axis=-1),
                               np.sort(np.asarray(s) ** 2, axis=-1),
                               rtol=1e-4)
