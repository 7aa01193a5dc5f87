"""PLY round-trip (reference 3DGS layout) and checkpoint/resume."""
import dataclasses

import numpy as np
import pytest

from gs_icp_slam_tpu.io import save_ply, load_ply, save_checkpoint, \
    load_checkpoint


def _params(n=17, n_rest=3, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=rng.normal(size=(n, n_rest, 3)).astype(np.float32),
        opacity_logit=rng.normal(size=(n, 1)).astype(np.float32),
        log_scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
    )


def test_ply_roundtrip(tmp_path):
    p = _params()
    path = str(tmp_path / "scene.ply")
    n = save_ply(path, p["xyz"], p["f_dc"], p["f_rest"],
                 p["opacity_logit"], p["log_scaling"], p["rotation"])
    assert n == 17
    out = load_ply(path)
    for k in p:
        np.testing.assert_array_equal(out[k], p[k], err_msg=k)


def test_ply_mask_and_sh0(tmp_path):
    p = _params(n=8, n_rest=0)
    mask = np.array([1, 0, 1, 1, 0, 0, 1, 1], bool)
    path = str(tmp_path / "m.ply")
    n = save_ply(path, p["xyz"], p["f_dc"], p["f_rest"],
                 p["opacity_logit"], p["log_scaling"], p["rotation"],
                 mask=mask)
    assert n == 5
    out = load_ply(path)
    np.testing.assert_array_equal(out["xyz"], p["xyz"][mask])
    assert out["f_rest"].shape == (5, 0, 3)


def test_ply_header_is_standard(tmp_path):
    p = _params(n=2, n_rest=0)
    path = str(tmp_path / "h.ply")
    save_ply(path, p["xyz"], p["f_dc"], p["f_rest"], p["opacity_logit"],
             p["log_scaling"], p["rotation"])
    head = open(path, "rb").read(400).decode("ascii", errors="replace")
    assert head.startswith("ply\nformat binary_little_endian 1.0\n")
    assert "element vertex 2" in head
    for attr in ["x", "nx", "f_dc_0", "opacity", "scale_2", "rot_3"]:
        assert f"property float {attr}" in head


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import SLAMEngine

    seq = open_dataset("synthetic", width=96, height=72, num_frames=6)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 13,
                           target_capacity=1 << 11,
                           visible_capacity=1 << 11)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=1))
    eng = SLAMEngine(seq, cfg)
    for i in range(3):
        eng.step(i, seq[i])
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(eng, path)

    eng2 = SLAMEngine(seq, cfg)
    load_checkpoint(eng2, path)
    assert int(eng2.gmap.n) == int(eng.gmap.n)
    assert eng2.kf_count == eng.kf_count
    np.testing.assert_array_equal(np.stack(eng2.poses), np.stack(eng.poses))
    # both resume and produce identical trajectories
    for i in range(3, 6):
        eng.step(i, seq[i])
        eng2.step(i, seq[i])
    np.testing.assert_allclose(np.stack(eng.poses), np.stack(eng2.poses),
                               atol=1e-5)


def test_engine_periodic_checkpoint_resume(tmp_path):
    """Crash recovery (SURVEY §5 'beyond'): a run autosaving every 4
    frames, killed after the save, resumes from disk and finishes with
    the same trajectory as the uninterrupted run (buckets may differ;
    they never change results)."""
    import dataclasses

    import numpy as np

    from gs_icp_slam_tpu.config import synthetic_config
    from gs_icp_slam_tpu.datasets import open_dataset
    from gs_icp_slam_tpu.slam import FusedEngine

    seq = open_dataset("synthetic", width=64, height=48, num_frames=8)
    cfg = synthetic_config(seq.intr, downsample_rate=4, capacity=1 << 13,
                           target_capacity=1 << 11,
                           visible_capacity=1 << 10)
    cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, mapping_iters_per_frame=1, mapping_iters_final=0,
        keyframe_capacity=8))
    ck = str(tmp_path / "auto.npz")

    full = FusedEngine(seq, cfg).run(eval_render=False)

    # interrupted run: autosaves at frame 4, "crashes" right after
    class Dies(Exception):
        pass

    eng_a = FusedEngine(seq, cfg)
    orig = __import__("gs_icp_slam_tpu.io.checkpoint",
                      fromlist=["save_fused_state"]).save_fused_state

    import gs_icp_slam_tpu.io.checkpoint as ckmod

    def save_then_die(state, path):
        orig(state, path)
        raise Dies

    ckmod.save_fused_state = save_then_die
    # the engine imports the symbol lazily inside run(), so patching the
    # module attribute is enough
    try:
        import pytest
        with pytest.raises(Dies):
            eng_a.run(eval_render=False, checkpoint_every=4,
                      checkpoint_path=ck)
    finally:
        ckmod.save_fused_state = orig

    res = FusedEngine(seq, cfg).run(eval_render=False, resume_from=ck)
    assert np.isfinite(res.poses).all()
    np.testing.assert_allclose(res.poses, full.poses, atol=1e-4)
