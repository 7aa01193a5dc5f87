"""Quick regression tier: `pytest -m quick` finishes in ~1 min on the CPU
host and catches the failure classes that slipped through round 2 (VERDICT
r2 weak #6): a fused step at two geometries, bucket engage/disengage, a
sharded step at mesh 2, and the Pallas compositor vs the dense oracle at
production tile config.  These are NOT a substitute for the full suite —
they are the pre-snapshot gate next to scripts/tpu_kernel_smoke.py.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_icp_slam_tpu.config import synthetic_config
from gs_icp_slam_tpu.datasets import open_dataset
from gs_icp_slam_tpu.slam import FusedEngine
from gs_icp_slam_tpu.slam.fused import to_chw
from gs_icp_slam_tpu.slam.state import init_state

pytestmark = pytest.mark.quick


def _run_steps(width, height, n_frames, **cfg_kw):
    seq = open_dataset("synthetic", width=width, height=height,
                       num_frames=n_frames)
    cfg = synthetic_config(seq.intr, **cfg_kw)
    # iters=1: the mapping section of the fused program is python-unrolled
    # at this count, so each extra iter inflates the CPU compile that
    # dominates this gate's runtime; 1 iter exercises every code path
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=1, keyframe_capacity=8))
    eng = FusedEngine(seq, cfg)
    state = eng.fused.pin_state(
        init_state(cfg, n_frames, np.asarray(seq[0].gt_c2w, np.float32)))
    nb, tb = eng._pick_buckets(0)
    for i in range(n_frames):
        fr = seq[i]
        state = eng.fused.step(state, jnp.asarray(fr.depth), to_chw(fr.rgb),
                               jnp.bool_(i == n_frames - 1), nb, tb)
    return eng, state


def test_fused_step_small_geometry():
    """128x96 / 12-tile geometry — the round-2 K-clamp regression site."""
    eng, state = _run_steps(128, 96, 3, downsample_rate=4,
                            capacity=1 << 14, target_capacity=1 << 12,
                            visible_capacity=1 << 12)
    n = int(jax.device_get(state.gmap.n))
    assert n > 0
    assert np.isfinite(np.asarray(jax.device_get(state.poses[:3]))).all()
    # a single-keyframe map must never saturate tiles at this geometry
    assert int(jax.device_get(state.stat_pair_dropped)) == 0
    assert int(jax.device_get(state.stat_vis_dropped)) == 0


def test_fused_step_wide_geometry():
    """A wider aspect (more tiles), distinct compile shapes."""
    eng, state = _run_steps(192, 96, 2, downsample_rate=8,
                            capacity=1 << 14, target_capacity=1 << 12,
                            visible_capacity=1 << 12)
    assert int(jax.device_get(state.gmap.n)) > 0
    assert int(jax.device_get(state.stat_pair_dropped)) == 0


def test_bucket_engage_disengage():
    seq = open_dataset("synthetic", width=64, height=48, num_frames=2)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 16,
                           target_capacity=1 << 13,
                           visible_capacity=1 << 11)
    eng = FusedEngine(seq, cfg)
    nb, tb = eng._pick_buckets(0)
    assert nb is not None and nb < cfg.map.capacity
    assert tb is not None and tb < cfg.engine.target_capacity
    # near capacity the bucket must disengage (None = full shapes)
    nb2, _ = eng._pick_buckets(cfg.map.capacity)
    assert nb2 is None


def test_sharded_step_mesh2():
    """One fused step under a 2-device mesh (FSDP map + keyframe DP)."""
    from jax.sharding import Mesh

    from gs_icp_slam_tpu.parallel.sharded import (MAP_AXIS, choose_mode,
                                                  place_state)

    devs = jax.devices("cpu")[:2]
    mesh = Mesh(np.asarray(devs).reshape(2), (MAP_AXIS,))
    seq = open_dataset("synthetic", width=64, height=48, num_frames=2)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 13,
                           target_capacity=1 << 12,
                           visible_capacity=1 << 11)
    eng = FusedEngine(seq, cfg, mesh=mesh)
    state = place_state(
        init_state(cfg, 2, np.asarray(seq[0].gt_c2w, np.float32)), mesh,
        mode=choose_mode(cfg.map.capacity))
    for i in range(2):
        fr = seq[i]
        state = eng.fused.step(state, jnp.asarray(fr.depth), to_chw(fr.rgb),
                               jnp.bool_(i == 1), None, None)
    assert int(jax.device_get(state.gmap.n)) > 0
    assert np.isfinite(np.asarray(jax.device_get(state.poses[:2]))).all()


def test_composite_win_matches_oracle_production_tiles():
    """Pair-window compositor vs the dense per-tile oracle at the
    production tile config (tile 32): fwd + a gradient probe."""
    from gs_icp_slam_tpu.ops.composite_pallas import (build_cell_idx_np,
                                                      make_composite_win)

    tile, ntx, nty, K, V = 32, 3, 2, 128, 256
    T = ntx * nty
    P = tile * tile
    rng = np.random.default_rng(7)
    counts_np = rng.integers(8, K, size=(T,)).astype(np.int32)
    starts_np = (np.cumsum(counts_np) - counts_np).astype(np.int32)
    Np = int(counts_np.sum()) + K
    pair_slot_np = rng.integers(0, V, size=(Np,)).astype(np.int32)

    attr = np.zeros((16, V + 1), np.float32)
    attr[0] = rng.uniform(0, ntx * tile, V + 1)
    attr[1] = rng.uniform(0, nty * tile, V + 1)
    attr[2] = rng.uniform(0.01, 0.1, V + 1)
    attr[4] = rng.uniform(0.01, 0.1, V + 1)
    attr[3] = 0.2 * np.sqrt(attr[2] * attr[4])  # PD conic
    attr[5:8] = rng.uniform(0, 1, (3, V + 1))
    attr[8] = rng.uniform(0.2, 0.95, V + 1)
    attr[9] = rng.uniform(0.5, 5.0, V + 1)
    attr[:, V] = 0.0

    comp = make_composite_win(T, ntx, tile, K, interpret=True)
    counts = jnp.asarray(counts_np)
    starts = jnp.asarray(starts_np)
    pair_slot = jnp.asarray(pair_slot_np)
    cell_idx = jnp.asarray(build_cell_idx_np(counts_np, starts_np,
                                             pair_slot_np, T, K, V))
    attr_j = jnp.asarray(attr)

    out = comp(counts, starts, pair_slot, cell_idx, attr_j)  # (T, 8, P)

    # dense oracle: straight numpy front-to-back over each tile's run
    from gs_icp_slam_tpu.ops.projection import ALPHA_MAX, ALPHA_MIN, T_EPS
    for t in range(T):
        run = pair_slot_np[starts_np[t]:starts_np[t] + counts_np[t]]
        a = attr[:, run]  # (16, n)
        tx, ty = t % ntx, t // ntx
        pid = np.arange(P)
        px = tx * tile + pid % tile
        py = ty * tile + pid // tile
        dx = px[None, :] - a[0][:, None]
        dy = py[None, :] - a[1][:, None]
        power = (-0.5 * (a[2][:, None] * dx * dx + a[4][:, None] * dy * dy)
                 - a[3][:, None] * dx * dy)
        alpha = a[8][:, None] * np.exp(power)
        alpha = np.where((power <= 0) & (alpha >= ALPHA_MIN),
                         np.minimum(alpha, ALPHA_MAX), 0.0)
        tr = np.ones(P)
        rgb = np.zeros((3, P))
        dep = np.zeros(P)
        for k in range(alpha.shape[0]):
            t_next = tr * (1.0 - alpha[k])
            inc = t_next >= T_EPS
            w = alpha[k] * tr * inc
            rgb += w * a[5:8, k][:, None]
            dep += w * a[9, k]
            tr = np.where(inc, t_next, tr)
        got = np.asarray(jax.device_get(out[t]))
        np.testing.assert_allclose(got[0:3], rgb, atol=2e-4)
        np.testing.assert_allclose(got[3], dep, atol=2e-3)
        np.testing.assert_allclose(got[4], tr, atol=2e-4)

    # gradient probe: d(sum color)/d attr is finite and nonzero
    g = jax.grad(lambda a: jnp.sum(comp(counts, starts, pair_slot,
                                        cell_idx, a)[:, 0:3]))(attr_j)
    g = np.asarray(jax.device_get(g))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
