"""CLI end-to-end (run/render/eval subcommands), sequence metrics, LPIPS
mechanics, and fused-state checkpoint roundtrip."""
import json
import os

import numpy as np
import pytest

from gs_icp_slam_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def run_out(tmp_path_factory):
    out = tmp_path_factory.mktemp("cliout")
    rc = cli_main([
        "run", "--dataset_type", "synthetic", "--frames", "10",
        "--downsample_rate", "4", "--capacity", str(1 << 14),
        "--mapping_iters_per_frame", "3", "--mapping_iters_final", "128",
        "--unlimited", "--eval_stride", "4", "--save_results",
        "--output_path", str(out),
        "--checkpoint_path", str(out / "ckpt.npz"),
    ])
    assert rc == 0
    return out


def test_cli_run_outputs(run_out):
    results = json.loads((run_out / "results.json").read_text())
    assert results["fps"] > 0
    assert results["ate_rmse_cm"] < 5.0
    assert results["psnr"] > 15.0
    assert results["ssim"] is not None
    assert (run_out / "scene.ply").exists()
    assert (run_out / "trajectory.npy").exists()
    assert (run_out / "results.txt").exists()


def test_cli_offline_render_and_eval(run_out, tmp_path):
    traj = np.load(run_out / "trajectory.npy")
    renders = tmp_path / "renders"
    rc = cli_main([
        "render", "--ply", str(run_out / "scene.ply"),
        "--trajectory", str(run_out / "trajectory.npy"),
        "--output_path", str(renders), "--width", "320", "--height", "240",
        "--fx", "185.6", "--fy", "185.6", "--stride", "5",
    ])
    assert rc == 0
    files = sorted(os.listdir(renders))
    assert len(files) == len(range(0, len(traj), 5))

    # eval renders against themselves -> PSNR huge, SSIM ~1
    outj = tmp_path / "metrics.json"
    rc = cli_main(["eval", "--renders", str(renders), "--gt", str(renders),
                   "--output_json", str(outj)])
    assert rc == 0
    m = json.loads(outj.read_text())
    assert m["mean"]["psnr"] > 60
    assert m["mean"]["ssim"] > 0.999


def test_fused_checkpoint_roundtrip(run_out):
    from gs_icp_slam_tpu.io.checkpoint import load_fused_state

    st = load_fused_state(str(run_out / "ckpt.npz"))
    assert int(st.frame_idx) == 10
    assert int(st.kf_count) >= 1
    assert st.gmap.xyz.shape[0] == (1 << 14)


def test_lpips_identity_and_sensitivity(tmp_path):
    """LPIPS(x, x) == 0 for ANY weights; differing images score > 0."""
    from gs_icp_slam_tpu.eval.lpips import lpips, make_random_weights

    wpath = str(tmp_path / "lpips_test.npz")
    make_random_weights(wpath)
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    import jax.numpy as jnp
    d_same = float(lpips(jnp.asarray(a), jnp.asarray(a), weights=wpath)[0])
    d_diff = float(lpips(jnp.asarray(a), jnp.asarray(b), weights=wpath)[0])
    assert abs(d_same) < 1e-6
    assert d_diff > d_same


def test_lpips_vgg_variant(tmp_path):
    """The VGG16 variant (metrics.py:74's lpipsPyTorch path) computes and
    keeps the LPIPS invariants."""
    from gs_icp_slam_tpu.eval.lpips import lpips, make_random_weights

    wpath = str(tmp_path / "lpips_vgg_test.npz")
    make_random_weights(wpath, net="vgg")
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    import jax.numpy as jnp
    d_same = float(lpips(jnp.asarray(a), jnp.asarray(a), weights=wpath)[0])
    d_diff = float(lpips(jnp.asarray(a), jnp.asarray(b), weights=wpath)[0])
    assert abs(d_same) < 1e-6
    assert d_diff > 0


def test_lpips_weight_schema_roundtrip(tmp_path):
    """The converter's conv-shape table must match the loader's _NETS spec
    exactly for both nets — a weights file produced by
    tools/convert_lpips_weights.py always loads (structural validation;
    real-value goldens need internet, which this image lacks)."""
    import importlib
    import importlib.util
    import os

    # the MODULE, not the re-exported function shadowing it in eval.__init__
    L = importlib.import_module("gs_icp_slam_tpu.eval.lpips")

    spec = importlib.util.spec_from_file_location(
        "convert_lpips_weights",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "convert_lpips_weights.py"))
    conv_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv_mod)

    for net in ("alex", "vgg"):
        expect = conv_mod.expected_conv_shapes(net)
        ours = [(oc, ic, k, k) for (oc, ic, k, _, _) in
                L._NETS[net]["convs"]]
        assert expect == ours, net
        # a file in the schema loads and validates
        wpath = str(tmp_path / f"w_{net}.npz")
        L.make_random_weights(wpath, net=net)
        loaded_net, convs, lins = L._load_weights(wpath)
        assert loaded_net == net
        assert len(convs) == len(expect)
        assert len(lins) == 5


def test_lpips_pinned_regression(tmp_path):
    """Numerics regression pin: with FIXED seeded weights and fixed inputs
    the LPIPS value must not drift (guards conv/pool/normalize wiring; NOT
    an official-weights golden — those cannot enter this image)."""
    from gs_icp_slam_tpu.eval.lpips import lpips, make_random_weights

    wpath = str(tmp_path / "w.npz")
    make_random_weights(wpath, seed=7)
    rng = np.random.default_rng(42)
    a = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    b = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    import jax.numpy as jnp
    d = float(lpips(jnp.asarray(a), jnp.asarray(b), weights=wpath)[0])
    # value computed at the time this test was written; tolerance covers
    # backend-dependent conv reduction order
    assert abs(d - 0.0132214) < 2e-4, d


def test_lpips_unavailable_raises(monkeypatch):
    # the MODULE, not the re-exported function shadowing it in eval.__init__
    import importlib

    L = importlib.import_module("gs_icp_slam_tpu.eval.lpips")

    monkeypatch.delenv("GS_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "default_weights_path", lambda: None)
    import jax.numpy as jnp
    x = jnp.zeros((3, 32, 32))
    with pytest.raises(FileNotFoundError):
        L.lpips(x, x)


def test_lpips_goldens():
    """Validate our LPIPS against OFFICIAL golden scores on the
    deterministic fixtures (VERDICT r2 #7).  Skips until (a) a converted
    weights file is provided via GS_LPIPS_WEIGHTS and (b) the goldens
    were computed off-image (tools/lpips_goldens.py compute)."""
    import json
    import os

    import jax.numpy as jnp
    import pytest

    from gs_icp_slam_tpu.eval.lpips import lpips
    from gs_icp_slam_tpu.eval.lpips_fixtures import fixture_pair

    gpath = os.path.join(os.path.dirname(__file__), "fixtures",
                         "lpips_goldens.json")
    with open(gpath) as f:
        goldens = json.load(f)
    weights = os.environ.get("GS_LPIPS_WEIGHTS")
    if not goldens.get("pairs"):
        pytest.skip("goldens pending (no egress here; see fixture note)")
    if not weights:
        pytest.skip("set GS_LPIPS_WEIGHTS to a converted weights npz")
    for name, want in goldens["pairs"].items():
        a, b = fixture_pair(name)
        got = float(lpips(jnp.asarray(a), jnp.asarray(b),
                          weights=weights)[0])
        assert abs(got - want) < 1e-3, (name, got, want)


def test_lpips_fixtures_deterministic():
    """The fixture pairs are bit-stable (the golden protocol depends on
    byte-exact reproduction across machines)."""
    import numpy as np

    from gs_icp_slam_tpu.eval.lpips_fixtures import (FIXTURE_NAMES,
                                                     fixture_pair)

    # checksums pin the generators; recompute = regenerate goldens
    sums = {n: float(np.sum(fixture_pair(n)[0]) + 2.0 *
                     np.sum(fixture_pair(n)[1]))
            for n in FIXTURE_NAMES}
    assert abs(sums["gradient_vs_checker"] - 20161.24) < 0.5, sums
    assert abs(sums["rings_vs_shifted"] - 21324.28) < 0.5, sums
    assert abs(sums["flat_vs_edge"] - 17203.20) < 0.5, sums
    for n in FIXTURE_NAMES:
        a1, b1 = fixture_pair(n)
        a2, b2 = fixture_pair(n)
        assert (a1 == a2).all() and (b1 == b2).all()
