#!/usr/bin/env python
"""ScanNet++ -> Replica-style traj.txt converter.

The reference ships this as a hardcoded-path script
(utils/scannetpp_pose.py:9-23); here it is a proper CLI: match each image
in <scene>/images against transforms_undistorted.json by file name and
write the 4x4 c2w poses as 16-value rows (the Replica traj.txt layout the
TrajManager/ReplicaSequence reader consumes).

    python tools/scannetpp_pose.py <scene_dir> [--out traj.txt]
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def convert(scene_dir: str, out_path: str | None = None,
            transforms: str = "transforms_undistorted.json") -> int:
    image_dir = os.path.join(scene_dir, "images")
    meta_path = os.path.join(scene_dir, transforms)
    out_path = out_path or os.path.join(scene_dir, "traj.txt")

    with open(meta_path) as f:
        meta = json.load(f)
    by_name = {fr["file_path"]: fr for fr in meta["frames"]}

    names = sorted(os.listdir(image_dir))
    missing = [n for n in names if n not in by_name]
    if missing:
        print(f"warning: {len(missing)} images without poses "
              f"(e.g. {missing[0]}); skipped", file=sys.stderr)

    n = 0
    with open(out_path, "w") as out:
        for name in names:
            fr = by_name.get(name)
            if fr is None:
                continue
            vals = [v for row in fr["transform_matrix"] for v in row]
            out.write(" ".join(str(float(v)) for v in vals) + "\n")
            n += 1
    print(f"wrote {n} poses -> {out_path}")
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--transforms", default="transforms_undistorted.json")
    a = ap.parse_args()
    convert(a.scene_dir, a.out, a.transforms)
