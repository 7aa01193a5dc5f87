"""Full-sequence rendering metrics: the reference's calc_2d_metric
(mp_Mapper.py:335-420) and offline metrics.py evaluate() as one runner.

For every (strided) frame: render the final map at the tracker's final
pose, then
  * PSNR masked by gt_depth > 0 (mp_Mapper.py:388-393 semantics: the
    prediction and gt are zeroed outside the mask and the MSE mean runs
    over the mask only),
  * SSIM (11x11 Gaussian window — utils/losses.py, torch-golden tested),
  * LPIPS-alex when weights are available (eval/lpips.py; this
    environment cannot ship the pretrained weights — see that module).

Returns means and per-frame arrays, and can dump side-by-side PNG
comparisons like the reference's matplotlib dumps (mp_Mapper.py:400-411).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.losses import ssim as ssim_fn
from .lpips import lpips, lpips_available


@dataclass
class SequenceMetrics:
    psnr: float
    ssim: float
    lpips: Optional[float]
    per_frame_psnr: np.ndarray
    per_frame_ssim: np.ndarray
    per_frame_lpips: Optional[np.ndarray]

    def summary(self) -> str:
        lp = f"{self.lpips:.4f}" if self.lpips is not None else "n/a"
        return (f"PSNR: {self.psnr:.3f} dB  SSIM: {self.ssim:.4f}  "
                f"LPIPS: {lp}")


@jax.jit
def _masked_psnr(pred, gt_img, gt_depth):
    mask = (gt_depth > 0.0)[None]
    mse = jnp.sum(((pred - gt_img) * mask) ** 2) / jnp.maximum(
        jnp.sum(mask) * 3.0, 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


@jax.jit
def _ssim_val(pred, gt_img):
    _, s = ssim_fn(pred, gt_img)
    return s


def evaluate_sequence(render_frame: Callable[[int], jnp.ndarray],
                      dataset, n: int, stride: int = 1,
                      depth_scale: float = 1.0,
                      dump_dir: Optional[str] = None,
                      dump_every: int = 100,
                      with_lpips: bool = True) -> SequenceMetrics:
    """render_frame(i) -> (3, H, W) float prediction for frame i."""
    use_lpips = with_lpips and lpips_available()
    psnrs, ssims, lps = [], [], []
    idxs = list(range(0, n, stride))
    for i in idxs:
        fr = dataset[i]
        pred = render_frame(i)
        gt_img = jnp.asarray(
            np.ascontiguousarray(fr.rgb.transpose(2, 0, 1))
        ).astype(jnp.float32) / 255.0
        gt_depth = jnp.asarray(fr.depth).astype(jnp.float32) / depth_scale
        psnrs.append(float(_masked_psnr(pred, gt_img, gt_depth)))
        ssims.append(float(_ssim_val(pred, gt_img)))
        if use_lpips:
            lps.append(float(lpips(pred, gt_img)[0]))
        if dump_dir and (i % dump_every == 0):
            _dump_compare(dump_dir, i, pred, gt_img)
    per_psnr = np.asarray(psnrs)
    per_ssim = np.asarray(ssims)
    per_lp = np.asarray(lps) if use_lpips else None
    return SequenceMetrics(
        psnr=float(per_psnr.mean()), ssim=float(per_ssim.mean()),
        lpips=float(per_lp.mean()) if per_lp is not None else None,
        per_frame_psnr=per_psnr, per_frame_ssim=per_ssim,
        per_frame_lpips=per_lp)


def _dump_compare(dump_dir: str, i: int, pred, gt) -> None:
    """Side-by-side prediction|gt PNG (reference mp_Mapper.py:400-411)."""
    os.makedirs(dump_dir, exist_ok=True)
    a = np.clip(np.asarray(pred), 0, 1)
    b = np.clip(np.asarray(gt), 0, 1)
    img = (np.concatenate([a, b], axis=2).transpose(1, 2, 0)
           * 255).astype(np.uint8)
    try:
        from PIL import Image
        Image.fromarray(img).save(os.path.join(dump_dir, f"frame_{i:06d}.png"))
    except Exception:
        np.save(os.path.join(dump_dir, f"frame_{i:06d}.npy"), img)
