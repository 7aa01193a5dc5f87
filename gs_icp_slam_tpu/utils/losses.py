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
from functools import lru_cache, partial

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
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@lru_cache(maxsize=8)
def _blur_mats(h: int, w: int, window_size: int, sigma: float):
    """Banded row/col Gaussian-blur matrices.

    A depthwise kxk conv with C=3 groups maps terribly onto the MXU (it
    ran on the VPU at ~42 ms fwd+bwd for 6 blurs of a 1200x680 image);
    the separable blur as two banded matmuls R @ img @ C^T is pure MXU
    work.  Truncation at the image border == SAME zero padding.
    """
    k = window_size // 2
    g = _gaussian_1d(window_size, sigma)

    def banded(n):
        m = np.zeros((n, n), np.float32)
        for d in range(-k, k + 1):
            v = g[d + k]
            idx = np.arange(max(0, -d), min(n, n - d))
            m[idx, idx + d] = v
        return m

    return banded(h), banded(w)


def _blur_matmul(img: jnp.ndarray, window_size: int,
                 sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (C, H, W) via banded matmuls (MXU)."""
    _, h, w = img.shape
    rm, cm = _blur_mats(h, w, window_size, sigma)
    rm = jnp.asarray(rm)
    cm = jnp.asarray(cm)
    x = jnp.einsum("hk,ckw->chw", rm, img,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("ckw,vw->ckv", x, cm,
                      preferred_element_type=jnp.float32)


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (C, H, W) as 2*k shift-multiply-adds.

    The banded-matmul form runs dense (H, H)/(W, W) matmuls whose bands
    are 11 wide — ~109x wasted MXU FLOPs at 1200x680 (SSIM fwd+bwd
    measured 2.4 ms of the 12.6 ms mapping step).  Static zero-padded
    slices keep the exact SAME truncated-kernel border semantics, on the
    VPU.  (A depthwise conv lowers worse than both: ~42 ms.)"""
    _, h, w = img.shape
    g = _gaussian_1d(window_size, sigma)
    k = window_size // 2
    xp = jnp.pad(img, ((0, 0), (k, k), (0, 0)))
    img = sum(g[i] * jax.lax.slice_in_dim(xp, i, i + h, axis=1)
              for i in range(window_size))
    xp = jnp.pad(img, ((0, 0), (0, 0), (k, k)))
    return sum(g[i] * jax.lax.slice_in_dim(xp, i, i + w, axis=2)
               for i in range(window_size))


def ssim(img: jnp.ndarray, gt: jnp.ndarray, window_size: int = 11):
    """SSIM with the reference's masking. img/gt are (C, H, W) in [0,1].

    Returns (ssim_map, scalar mean).
    """
    img = jnp.where(gt != 0.0, img, 0.0)
    blur = partial(_blur, window_size=window_size, sigma=1.5)

    mu1 = blur(img)
    mu2 = blur(gt)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blur(img * img) - mu1_sq
    sigma2_sq = blur(gt * gt) - mu2_sq
    sigma12 = blur(img * gt) - mu1_mu2

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
