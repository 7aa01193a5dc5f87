"""RGB-D -> point cloud conversion with the reference's pixel-grid
downsampling scheme (gs_icp_slam.py:177-196, mp_Tracker.py:394-431).

The downsample pattern picks every `rate`-th column on rows
{0, rate-1, 2*rate-1, ...} (the first row is special-cased to 0).  The
unprojection coefficients x_pre=(u-cx)/fx, y_pre=(v-cy)/fy are precomputed
once; per frame only two multiplies remain.  Static shapes: every frame
yields exactly len(idxs) samples; invalid depths are masked, not dropped.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DownsampleFilter:
    """Precomputed subsample indices + unprojection coefficients."""

    flat_idxs: np.ndarray  # (P,) int32 flat pixel indices into H*W
    x_pre: np.ndarray  # (P,) float32, (u-cx)/fx
    y_pre: np.ndarray  # (P,) float32, (v-cy)/fy
    gh: int = 0  # sample-grid rows (P = gh * gw, row-major)
    gw: int = 0  # sample-grid cols

    @property
    def num_points(self) -> int:
        return int(self.flat_idxs.shape[0])


def make_downsample_filter(width: int, height: int, fx: float, fy: float,
                           cx: float, cy: float, rate: int) -> DownsampleFilter:
    """Replicates the reference's set_downsample_filter row/col pattern."""
    h_val = rate * np.arange(0, int(height / rate) + 1)
    h_val = h_val - 1
    h_val[0] = 0
    h_val = h_val * width
    a, b = np.meshgrid(h_val, np.arange(0, width, rate), indexing="ij")
    flat_idxs = (a + b).reshape(-1).astype(np.int32)
    u = (flat_idxs % width).astype(np.float32)
    v = (flat_idxs // width).astype(np.float32)
    x_pre = (u - cx) / fx
    y_pre = (v - cy) / fy
    return DownsampleFilter(flat_idxs=flat_idxs, x_pre=x_pre, y_pre=y_pre,
                            gh=len(h_val), gw=len(range(0, width, rate)))


def downsample_pointcloud(filt: DownsampleFilter, depth: jnp.ndarray, rgb: jnp.ndarray,
                          depth_scale: float, depth_trunc: float):
    """Build the per-frame downsampled point cloud (static shapes).

    Args:
      depth: (H, W) raw depth (to be divided by depth_scale).
      rgb: (H, W, 3) uint8 or float RGB.
    Returns dict with, all length P = filt.num_points:
      points:  (P, 3) camera-frame xyz (garbage where invalid, masked out)
      colors:  (P, 3) in [0, 1]
      z:       (P,)   metric depth
      valid:   (P,)   bool, z != 0   (these become gaussians)
      trackable: (P,) bool, valid & z <= depth_trunc (used for tracking)
    """
    idxs = jnp.asarray(filt.flat_idxs)
    z = depth.reshape(-1)[idxs].astype(jnp.float32) / depth_scale
    colors = rgb.reshape(-1, 3)[idxs].astype(jnp.float32)
    colors = colors / 255.0 if rgb.dtype == jnp.uint8 else colors
    x = jnp.asarray(filt.x_pre) * z
    y = jnp.asarray(filt.y_pre) * z
    points = jnp.stack([x, y, z], axis=-1)
    valid = z != 0.0
    trackable = valid & (z <= depth_trunc)
    return {"points": points, "colors": colors, "z": z, "valid": valid,
            "trackable": trackable}
