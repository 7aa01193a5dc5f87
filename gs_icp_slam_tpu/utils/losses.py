"""Mapping losses: depth-masked L1 and SSIM, plus PSNR.

Semantics match the reference exactly (utils/loss_utils.py:17-69,
utils/image_utils.py:17-19):
  * l1: |x-y| zeroed where gt == 0, then mean over ALL elements (the mask
    does not renormalize the mean — that implicit down-weighting is part of
    the reference behaviour and affects training dynamics).
  * ssim: prediction zeroed where gt == 0, 11x11 Gaussian window sigma=1.5,
    per-channel depthwise convolution with SAME zero padding.
Images are channels-first (C, H, W) like the reference.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def l1_masked(pred: jnp.ndarray, gt: jnp.ndarray):
    """Masked L1. Returns (per-element map, scalar mean over all elements)."""
    diff = jnp.abs(pred - gt)
    diff = jnp.where(gt != 0.0, diff, 0.0)
    return diff, diff.mean()


def l2_masked(pred: jnp.ndarray, gt: jnp.ndarray):
    diff = (pred - gt) ** 2
    diff = jnp.where(gt != 0.0, diff, 0.0)
    return diff.mean()


@lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _depthwise_conv2d(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img (C, H, W), window (k, k) -> same-shape depthwise convolution."""
    c = img.shape[0]
    k = window.shape[0]
    lhs = img[None]  # (1, C, H, W)
    rhs = jnp.broadcast_to(window[None, None], (c, 1, k, k))
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]


def ssim(img: jnp.ndarray, gt: jnp.ndarray, window_size: int = 11):
    """SSIM with the reference's masking. img/gt are (C, H, W) in [0,1].

    Returns (ssim_map, scalar mean).
    """
    img = jnp.where(gt != 0.0, img, 0.0)
    window = jnp.asarray(_gaussian_window(window_size, 1.5))

    mu1 = _depthwise_conv2d(img, window)
    mu2 = _depthwise_conv2d(gt, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_conv2d(img * img, window) - mu1_sq
    sigma2_sq = _depthwise_conv2d(gt * gt, window) - mu2_sq
    sigma12 = _depthwise_conv2d(img * gt, window) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map, ssim_map.mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """PSNR over the full image (values in [0,1])."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def mse_to_psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """Reference mp_Mapper.mse2psnr (mp_Mapper.py:422-423)."""
    return -10.0 * jnp.log(mse) / math.log(10.0)


def mapping_loss(image, depth, gt_image, gt_depth, lambda_dssim: float = 0.2,
                 depth_weight: float = 0.1, d_max: float = 10.0):
    """Full mapping loss of the reference mapper (mp_Mapper.py:225-240).

    gt_image is pre-masked by (gt_depth > 0); L1 and SSIM mask internally on
    gt == 0; depth term is L1 on depth/d_max, weighted by `depth_weight`.
    Returns (scalar loss, aux dict).
    """
    mask = (gt_depth > 0.0).astype(image.dtype)
    gt_image = gt_image * mask
    _, l1 = l1_masked(image, gt_image)
    _, ssim_val = ssim(image, gt_image)
    _, l1_d = l1_masked(depth / d_max, gt_depth / d_max)
    loss_rgb = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_val)
    loss = loss_rgb + depth_weight * l1_d
    return loss, {"l1": l1, "ssim": ssim_val, "l1_depth": l1_d}
