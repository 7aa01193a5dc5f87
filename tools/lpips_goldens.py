"""Compute / validate LPIPS golden values for the deterministic fixtures.

Run `compute` on a machine WITH internet (needs `pip install lpips torch`):
    python tools/lpips_goldens.py compute [--net alex|vgg]
writes the official scores into tests/fixtures/lpips_goldens.json.

Run `validate` anywhere with a converted weights file
(tools/convert_lpips_weights.py):
    python tools/lpips_goldens.py validate --weights lpips_alex.npz
checks the pure-JAX implementation (gs_icp_slam_tpu/eval/lpips.py)
against the stored goldens to 1e-3.  tests/test_cli_eval.py runs the same
check automatically when GS_LPIPS_WEIGHTS is set and goldens are filled.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDENS = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "lpips_goldens.json")


def cmd_compute(net: str):
    import numpy as np
    import torch
    import lpips as lpips_official  # pip install lpips

    from gs_icp_slam_tpu.eval.lpips_fixtures import (FIXTURE_NAMES,
                                                     fixture_pair)

    model = lpips_official.LPIPS(net=net)
    model.eval()
    out = {"net": net, "note": "official richzhang/PerceptualSimilarity "
           f"lpips.LPIPS(net='{net}') on the deterministic fixtures",
           "pairs": {}}
    for name in FIXTURE_NAMES:
        a, b = fixture_pair(name)
        # lpips expects NCHW in [-1, 1]
        ta = torch.from_numpy(a[None] * 2.0 - 1.0)
        tb = torch.from_numpy(b[None] * 2.0 - 1.0)
        with torch.no_grad():
            d = float(model(ta, tb).item())
        out["pairs"][name] = d
        print(f"{name}: {d:.6f}")
    with open(GOLDENS, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", GOLDENS)


def cmd_validate(weights: str, atol: float = 1e-3):
    import jax.numpy as jnp

    from gs_icp_slam_tpu.eval.lpips import lpips
    from gs_icp_slam_tpu.eval.lpips_fixtures import fixture_pair

    with open(GOLDENS) as f:
        g = json.load(f)
    if not g.get("pairs"):
        sys.exit("goldens not computed yet — run `compute` on an "
                 "internet machine first")
    # the net variant is read from the weights npz itself; it must match
    # the goldens' net (the converter stamps it)
    bad = 0
    for name, want in g["pairs"].items():
        a, b = fixture_pair(name)
        got = float(lpips(jnp.asarray(a), jnp.asarray(b),
                          weights=weights)[0])
        ok = abs(got - want) <= atol
        bad += (not ok)
        print(f"{name}: ours {got:.6f} vs official {want:.6f} "
              f"{'OK' if ok else 'MISMATCH'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compute")
    c.add_argument("--net", default="alex", choices=("alex", "vgg"))
    v = sub.add_parser("validate")
    v.add_argument("--weights", required=True)
    v.add_argument("--atol", type=float, default=1e-3)
    args = ap.parse_args()
    if args.cmd == "compute":
        cmd_compute(args.net)
    else:
        cmd_validate(args.weights, args.atol)
