"""Offline rendering of a saved map along a trajectory — the reference's
render.py (SURVEY §2.17): load a 3DGS PLY, render every (strided) pose,
write PNGs.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.ply import load_ply
from ..ops.rasterize import rasterize_tiled
from ..utils.se3 import invert_se3


def render_ply_sequence(ply_path: str, poses_c2w: np.ndarray, out_dir: str,
                        width: int, height: int, fx: float, fy: float,
                        stride: int = 1, bg=(0.0, 0.0, 0.0),
                        visible_cap: int = 1 << 17,
                        tile_cap: int = 256) -> int:
    d = load_ply(ply_path)
    n = len(d["xyz"])
    sh_rest = d["f_rest"].shape[1]
    sh_degree = int(np.sqrt(sh_rest + 1)) - 1
    xyz = jnp.asarray(d["xyz"])
    quat = jnp.asarray(d["rotation"])
    scale = jnp.exp(jnp.asarray(d["log_scaling"]))
    opacity = jax.nn.sigmoid(jnp.asarray(d["opacity_logit"][:, 0]))
    sh = jnp.concatenate([jnp.asarray(d["f_dc"]),
                          jnp.asarray(d["f_rest"])], axis=1)
    live = jnp.ones((n,), bool)
    bg = jnp.asarray(bg, jnp.float32)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0

    render = jax.jit(partial(
        rasterize_tiled, sh_degree=sh_degree, width=width, height=height,
        visible_cap=min(visible_cap, n), tile_cap=tile_cap,
        want_used=False))

    count = 0
    os.makedirs(out_dir, exist_ok=True)
    for i in range(0, len(poses_c2w), stride):
        w2c = invert_se3(jnp.asarray(poses_c2w[i], jnp.float32))
        out = render(xyz, quat, scale, opacity, sh, w2c, live, bg,
                     fx, fy, cx, cy)
        img = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
        img8 = (img * 255).astype(np.uint8)
        try:
            from PIL import Image
            Image.fromarray(img8).save(
                os.path.join(out_dir, f"{i:06d}.png"))
        except Exception:
            np.save(os.path.join(out_dir, f"{i:06d}.npy"), img8)
        count += 1
    return count
