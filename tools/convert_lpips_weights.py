#!/usr/bin/env python
"""Convert official LPIPS (alex) weights to the npz format eval/lpips.py
loads.  Run this on a machine WITH internet access (this repo's target
environment has none), then copy the npz over:

    pip install lpips torch
    python tools/convert_lpips_weights.py lpips_alex.npz
    # -> set GS_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

Reads the AlexNet trunk + linear calibration heads from the `lpips` pip
package (Zhang et al., CVPR 2018 — the same weights torchmetrics and the
reference's lpipsPyTorch use).
"""
import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    alex = net.net  # trunk wrapper; .slice1..slice5 hold the convs
    convs = []
    for mod in [alex.slice1, alex.slice2, alex.slice3, alex.slice4,
                alex.slice5]:
        for layer in mod:
            if layer.__class__.__name__ == "Conv2d":
                convs.append(layer)
    assert len(convs) == 5, len(convs)
    out = {}
    for i, c in enumerate(convs):
        out[f"conv{i}.weight"] = c.weight.detach().numpy()
        out[f"conv{i}.bias"] = c.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}.weight"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
