"""Gaussian map pytree: append / prune / trackable export / compaction /
masked Adam — reference semantics from scene/gaussian_model.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_icp_slam_tpu.models import (GaussianMap, empty_map, add_gaussians,
                                    prune_large_and_transparent,
                                    trackable_export, compact, map_params,
                                    with_params, adam_init, adam_step,
                                    map_lr_tree)
from gs_icp_slam_tpu.config import OptConfig

C0 = 0.28209479177387814


def _batch(p, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        points=jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(size=(p, 3)).astype(np.float32)),
        quats=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (p, 1)),
        scales=jnp.asarray(rng.uniform(0.01, 0.1, size=(p, 3)).astype(np.float32)),
        z_vals=jnp.asarray(rng.uniform(0.5, 3.0, size=(p,)).astype(np.float32)),
    )


def test_add_and_masks():
    m = empty_map(64)
    b = _batch(8)
    valid = jnp.array([1, 1, 0, 1, 1, 1, 0, 1], bool)
    trackable = jnp.ones((8,), bool)
    m = add_gaussians(m, **b, trackable=trackable, valid=valid)
    assert int(m.n) == 6
    assert int(m.num_live) == 6
    # valid rows packed in order: row 0,1,3,4,5,7
    np.testing.assert_allclose(np.asarray(m.xyz[2]), np.asarray(b["points"][3]),
                               rtol=1e-6)
    # SH DC init: (c - 0.5) / C0  (utils/sh_utils.py RGB2SH)
    np.testing.assert_allclose(np.asarray(m.f_dc[0]),
                               (np.asarray(b["colors"][0]) - 0.5) / C0,
                               rtol=1e-5)
    # opacity init 0.1 through the sigmoid
    np.testing.assert_allclose(np.asarray(m.opacity[:6, 0]), 0.1, rtol=1e-5)
    # scale init: log(scale / clamp(z^1.5 * 2, 1))
    z = np.asarray(b["z_vals"][0])
    expect = np.log(np.asarray(b["scales"][0]) / max((z ** 1.5) * 2.0, 1.0))
    np.testing.assert_allclose(np.asarray(m.log_scaling[0]), expect, rtol=1e-5)


def test_add_overflow_drops():
    m = empty_map(4)
    b = _batch(8)
    m = add_gaussians(m, **b, trackable=jnp.ones((8,), bool),
                      valid=jnp.ones((8,), bool))
    assert int(m.n) == 4
    assert int(m.num_live) == 4


def test_prune():
    m = empty_map(16)
    b = _batch(8)
    m = add_gaussians(m, **b, trackable=jnp.ones((8,), bool),
                      valid=jnp.ones((8,), bool))
    # make slot 1 transparent, slot 2 huge
    op = m.opacity_logit.at[1].set(-10.0)
    ls = m.log_scaling.at[2].set(jnp.log(jnp.array([1.0, 1.0, 1.0])))
    m = m._replace(opacity_logit=op, log_scaling=ls)
    m2 = prune_large_and_transparent(m, min_opacity=0.005, extent=2.5)
    live = np.asarray(m2.live)
    assert not live[1] and not live[2]
    assert live[0] and live[3:8].all()
    # extent=None prunes only by opacity
    m3 = prune_large_and_transparent(m, min_opacity=0.005, extent=None)
    assert not np.asarray(m3.live)[1] and np.asarray(m3.live)[2]


def test_trackable_export():
    m = empty_map(16)
    b = _batch(8)
    trackable = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    m = add_gaussians(m, **b, trackable=trackable, valid=jnp.ones((8,), bool))
    # default opacity 0.1 > 0.05 threshold
    pts, rots, scales, valid = trackable_export(m, 0.05, out_capacity=8)
    assert int(valid.sum()) == 4
    np.testing.assert_allclose(np.asarray(pts[:4]), np.asarray(b["points"][:4]),
                               rtol=1e-6)
    # rotations come out normalized, scales exponentiated
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rots[:4]), axis=-1),
                               1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scales[0]),
                               np.exp(np.asarray(m.log_scaling[0])), rtol=1e-6)


def test_compact_permutes_adam_state():
    m = empty_map(16)
    b = _batch(8)
    m = add_gaussians(m, **b, trackable=jnp.ones((8,), bool),
                      valid=jnp.ones((8,), bool))
    params = map_params(m)
    st = adam_init(params)
    # fake some moment state
    st = st._replace(m=jax.tree.map(lambda x: x + 1.0, st.m))
    live = m.live.at[2].set(False).at[5].set(False)
    m = m._replace(live=live)
    m2, (new_m, new_v) = compact(m, extra_trees=[(st.m, st.v)])
    assert int(m2.n) == 6
    assert bool(m2.live[:6].all()) and not bool(m2.live[6:].any())
    # surviving rows keep their moments; freed tail rows are zeroed
    assert np.asarray(new_m["xyz"][:6]).min() == 1.0
    assert np.abs(np.asarray(new_m["xyz"][6:])).max() == 0.0
    # order preserved: old rows 0,1,3,4,6,7
    np.testing.assert_allclose(np.asarray(m2.xyz[2]), np.asarray(b["points"][3]),
                               rtol=1e-6)


def test_adam_masked_step():
    m = empty_map(8)
    b = _batch(4)
    m = add_gaussians(m, **b, trackable=jnp.ones((4,), bool),
                      valid=jnp.ones((4,), bool))
    params = map_params(m)
    st = adam_init(params)
    lrs = map_lr_tree(OptConfig())
    grads = jax.tree.map(jnp.ones_like, params)
    mask = m.live
    p2, st2 = adam_step(params, grads, st, lrs, mask)
    # live slots moved opposite the gradient by ~lr (bias-corrected 1st step)
    dx = np.asarray(params["xyz"] - p2["xyz"])
    assert np.all(dx[:4] > 0)
    np.testing.assert_allclose(dx[:4], 1.6e-6 * 2.5, rtol=2e-2)
    # dead slots untouched
    assert np.abs(dx[4:]).max() == 0.0
    assert int(st2.step) == 1
    # opacity lr is different per group
    dop = np.asarray(params["opacity_logit"] - p2["opacity_logit"])
    np.testing.assert_allclose(dop[:4], 0.05, rtol=1e-3)


def test_adam_jit_and_grad_through_render_params():
    """adam_step must be jittable with the map param tree."""
    m = empty_map(8)
    b = _batch(4)
    m = add_gaussians(m, **b, trackable=jnp.ones((4,), bool),
                      valid=jnp.ones((4,), bool))
    params = map_params(m)
    st = adam_init(params)
    lrs = map_lr_tree(OptConfig())

    @jax.jit
    def step(params, st, live):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum(p["xyz"] ** 2) + jnp.sum(p["opacity_logit"] ** 2)
        )(params)
        p2, st2 = adam_step(params, grads, st, lrs, live)
        return loss, p2, st2

    loss, p2, st2 = step(params, st, m.live)
    assert np.isfinite(float(loss))
    m2 = with_params(m, p2)
    assert isinstance(m2, GaussianMap)
