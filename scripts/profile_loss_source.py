"""Slope-timed: mapping_loss (L1+SSIM+depth) fwd / fwd+bwd at bench
resolution, and make_source's internals (grid kNN, covariance estimate,
eigendecomp) at bench point count."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.utils.profiling import slope_time  # noqa: E402


def main():
    from gs_icp_slam_tpu.config import GICPConfig
    from gs_icp_slam_tpu.ops.covariance import (cov_to_quat_scale,
                                                estimate_covariances,
                                                regularize_plane)
    from gs_icp_slam_tpu.ops.gicp import make_source
    from gs_icp_slam_tpu.ops.knn import knn_search_grid
    from gs_icp_slam_tpu.utils.losses import mapping_loss

    H, W = 680, 1200
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    dep = jnp.asarray(rng.uniform(0, 5, (H, W)).astype(np.float32))
    gtd = jnp.asarray(rng.uniform(0.1, 5, (H, W)).astype(np.float32))

    def loss_fwd(s):
        l, _ = mapping_loss(img + s, dep, gt, gtd, lambda_dssim=0.2,
                            depth_weight=0.1, d_max=10.0)
        return l

    def loss_bwd(s):
        return jax.grad(lambda i: mapping_loss(
            i, dep, gt, gtd, lambda_dssim=0.2, depth_weight=0.1,
            d_max=10.0)[0])(img + s)

    def loss_l1_only(s):
        mask = (gtd > 0)[None]
        return jnp.sum(jnp.abs((img + s) - gt) * mask)

    # make_source at bench load: 120x68 grid, ds 10 -> 8160 points
    gh, gw = 68, 120
    S = gh * gw
    pts = jnp.asarray(rng.uniform(-2, 2, (S, 3)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=S) > 0.05)
    cfg = GICPConfig()

    def src_full(s):
        return make_source(pts + s, valid, cfg, grid=(gh, gw)).cov6

    def src_knn(s):
        return knn_search_grid(pts + s, valid, gh, gw,
                               k=cfg.k_neighbors, span=cfg.grid_knn_span)

    idx, sqd = jax.jit(lambda p: knn_search_grid(
        p, valid, gh, gw, k=cfg.k_neighbors,
        span=cfg.grid_knn_span))(pts)

    def src_cov(s):
        return estimate_covariances(pts + s, idx, valid, neighbor_sqd=sqd,
                                    max_dist=cfg.knn_max_distance)

    cov = jax.jit(lambda p: estimate_covariances(
        p, idx, valid, neighbor_sqd=sqd,
        max_dist=cfg.knn_max_distance))(pts)

    def src_eig(s):
        return cov_to_quat_scale(cov + s)

    def src_reg(s):
        return regularize_plane(cov + s, cfg.plane_eps)

    for name, fn in [("mapping_loss fwd", loss_fwd),
                     ("mapping_loss fwd+bwd", loss_bwd),
                     ("masked L1 only", loss_l1_only),
                     ("make_source full", src_full),
                     ("  grid kNN", src_knn),
                     ("  cov estimate", src_cov),
                     ("  eigendecomp", src_eig),
                     ("  regularize", src_reg)]:
        print(f"{name:24s} {slope_time(fn, R=8):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
