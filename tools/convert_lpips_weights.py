#!/usr/bin/env python
"""Convert official LPIPS weights to the npz format eval/lpips.py loads.
Run this on a machine WITH internet access (this repo's target environment
has none), then copy the npz over:

    pip install lpips torch
    python tools/convert_lpips_weights.py --net alex lpips_alex.npz
    python tools/convert_lpips_weights.py --net vgg  lpips_vgg.npz
    # -> set GS_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

Reads the trunk + linear calibration heads from the `lpips` pip package
(Zhang et al., CVPR 2018 — the same weights torchmetrics' alex variant,
mp_Mapper.py:19, and the reference's bundled lpipsPyTorch vgg variant,
metrics.py:74, use).

The output schema is validated structurally against eval/lpips.py by
tests/test_cli_eval.py::test_lpips_weight_schema_roundtrip — the same
conv-shape table drives both the converter's assertions and the loader.
"""
import argparse

import numpy as np


def expected_conv_shapes(net: str):
    """Mirror of eval/lpips.py's _NETS conv table (kept import-free so this
    script runs on the internet machine without the repo)."""
    if net == "alex":
        return [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                (256, 384, 3, 3), (256, 256, 3, 3)]
    if net == "vgg":
        chans = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
                 (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
                 (512, 512), (512, 512), (512, 512)]
        return [(o, i, 3, 3) for o, i in chans]
    raise ValueError(net)


def main(out_path: str, net: str) -> None:
    import lpips as lpips_pkg  # type: ignore

    model = lpips_pkg.LPIPS(net=net, spatial=False)
    trunk = model.net  # wrapper; .slice1..slice5 hold the convs
    convs = []
    for mod in [trunk.slice1, trunk.slice2, trunk.slice3, trunk.slice4,
                trunk.slice5]:
        for layer in mod:
            if layer.__class__.__name__ == "Conv2d":
                convs.append(layer)
    shapes = expected_conv_shapes(net)
    assert len(convs) == len(shapes), (len(convs), len(shapes))
    out = {"net": np.asarray(net)}
    for i, (c, shp) in enumerate(zip(convs, shapes)):
        w = c.weight.detach().numpy()
        assert w.shape == shp, (i, w.shape, shp)
        out[f"conv{i}.weight"] = w
        out[f"conv{i}.bias"] = c.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}.weight"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="lpips_alex.npz")
    ap.add_argument("--net", default="alex", choices=("alex", "vgg"))
    a = ap.parse_args()
    main(a.out, a.net)
