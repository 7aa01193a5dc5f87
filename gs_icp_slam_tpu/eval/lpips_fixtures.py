"""Deterministic image pairs for LPIPS golden-value validation.

The reference produces real perceptual numbers (torchmetrics-alex at
mp_Mapper.py:340, lpipsPyTorch-vgg at metrics.py:74); this environment has
no egress, so official pretrained weights — and therefore official golden
outputs — cannot be produced here.  The closure protocol (VERDICT r2 #7):

1. These generators define byte-exact image pairs from closed-form math
   (no RNG, no platform-dependent ops beyond f32 arithmetic).
2. On any machine with internet, `python tools/lpips_goldens.py compute`
   runs the OFFICIAL `lpips` package on the same pairs and fills
   tests/fixtures/lpips_goldens.json.
3. `python tools/lpips_goldens.py validate --weights w.npz` (or the
   skip-guarded test in tests/test_cli_eval.py) then checks our pure-JAX
   LPIPS against those goldens with the converted weights file — closing
   the loop: weights file -> provably correct LPIPS.
"""
from __future__ import annotations

import numpy as np

H = W = 64


def _grid():
    y = np.arange(H, dtype=np.float32)[:, None] / (H - 1)
    x = np.arange(W, dtype=np.float32)[None, :] / (W - 1)
    return (np.broadcast_to(y, (H, W)).astype(np.float32),
            np.broadcast_to(x, (H, W)).astype(np.float32))


def fixture_pair(name: str):
    """Return (img_a, img_b), each (3, H, W) float32 in [0, 1]."""
    y, x = _grid()
    if name == "gradient_vs_checker":
        a = np.stack([x, y, 0.5 * (x + y)])
        checker = 0.15 * (((np.floor(y * 8) + np.floor(x * 8)) % 2)
                          .astype(np.float32))
        b = np.clip(a + checker[None], 0.0, 1.0)
    elif name == "rings_vs_shifted":
        r = np.sqrt((y - 0.5) ** 2 + (x - 0.5) ** 2)
        a = np.stack([0.5 + 0.5 * np.sin(20 * r),
                      0.5 + 0.5 * np.cos(20 * r),
                      np.clip(2 * r, 0, 1)]).astype(np.float32)
        r2 = np.sqrt((y - 0.4) ** 2 + (x - 0.6) ** 2)
        b = np.stack([0.5 + 0.5 * np.sin(20 * r2),
                      0.5 + 0.5 * np.cos(20 * r2),
                      np.clip(2 * r2, 0, 1)]).astype(np.float32)
    elif name == "flat_vs_edge":
        a = np.full((3, H, W), 0.4, np.float32)
        b = a.copy()
        b[:, :, W // 2:] = 0.6
    else:
        raise KeyError(name)
    return a.astype(np.float32), b.astype(np.float32)


FIXTURE_NAMES = ("gradient_vs_checker", "rings_vs_shifted", "flat_vs_edge")
