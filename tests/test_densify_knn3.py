"""densify_clone_split (parity feature, off by default) and the
simple-knn distCUDA2 equivalent."""
import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.models import (add_gaussians, densify_clone_split,
                                    empty_map)
from gs_icp_slam_tpu.ops.knn import mean_sq_dist_3nn


def _populated(n=64, cap=256, seed=0, scale=0.01):
    rng = np.random.default_rng(seed)
    m = empty_map(cap, 0)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    quat = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    scl = np.full((n, 3), scale, np.float32)
    z = np.ones((n,), np.float32)
    ones = jnp.ones((n,), bool)
    return add_gaussians(m, jnp.asarray(pts), jnp.asarray(cols),
                         jnp.asarray(quat), jnp.asarray(scl),
                         jnp.asarray(z), ones, ones)


def test_densify_clone_copies_small_high_grad():
    m = _populated(scale=0.001)  # small gaussians -> clone branch
    grad = jnp.zeros((m.capacity,)).at[:8].set(1.0)
    out = densify_clone_split(m, grad, extent=1.0,
                              rng=jax.random.PRNGKey(0), max_new=32)
    # 8 clones appended, originals kept
    assert int(out.num_live) == int(m.num_live) + 8
    np.testing.assert_allclose(np.asarray(out.xyz[64:72]),
                               np.asarray(m.xyz[:8]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.log_scaling[64:72]),
                               np.asarray(m.log_scaling[:8]), atol=1e-6)


def test_densify_split_samples_and_prunes():
    m = _populated(scale=0.5)  # large gaussians -> split branch
    grad = jnp.zeros((m.capacity,)).at[:4].set(1.0)
    out = densify_clone_split(m, grad, extent=1.0,
                              rng=jax.random.PRNGKey(1), max_new=32)
    # each split: +2 samples, original pruned -> net +4
    assert int(out.num_live) == int(m.num_live) + 4
    assert not bool(out.live[0])  # original killed
    # new scales shrunk by 1.6
    np.testing.assert_allclose(
        np.asarray(out.log_scaling[64]),
        np.asarray(m.log_scaling[0]) - np.log(1.6), atol=1e-5)


def test_densify_no_trigger_is_noop():
    m = _populated()
    out = densify_clone_split(m, jnp.zeros((m.capacity,)), extent=1.0,
                              rng=jax.random.PRNGKey(2))
    assert int(out.num_live) == int(m.num_live)


def test_mean_sq_dist_3nn_matches_numpy():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    valid = np.ones(50, bool)
    valid[::9] = False
    got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), jnp.asarray(valid)))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    d2[:, ~valid] = np.inf
    for i in range(50):
        if not valid[i]:
            assert got[i] == 0.0
            continue
        nn = np.sort(d2[i])[1:4]  # skip self
        np.testing.assert_allclose(got[i], nn.mean(), rtol=1e-4)
