"""LPIPS (AlexNet variant) in pure JAX.

The reference evaluates LPIPS twice: in-process with torchmetrics' alex
variant (mp_Mapper.py:19,340) and offline with a bundled lpipsPyTorch
(metrics.py:74).  This is the same computation — AlexNet feature trunk,
per-layer unit-normalized feature differences, non-negative 1x1 linear
calibration heads, spatial mean, layer sum — implemented directly on
lax.conv so it runs on TPU/CPU without torch.

Weights: this environment has no network egress and no torchvision, so
pretrained weights cannot be baked in.  Provide them as an .npz via the
`weights` argument or the GS_LPIPS_WEIGHTS env var; create that file on
any machine with internet using tools/convert_lpips_weights.py (reads
the official `lpips` pip package / torchvision AlexNet checkpoint).
Without weights, `lpips_available()` is False and evaluation reports
LPIPS as None — the number would be meaningless with random features.

Note LPIPS(x, x) == 0 holds for ANY weights (the metric is a norm of
feature differences), which is what the unit tests pin down.
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature trunk (torchvision layout): (out_c, in_c, k, stride, pad)
_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool 3x3 stride 2 after conv1 and conv2

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> Optional[str]:
    p = os.environ.get("GS_LPIPS_WEIGHTS")
    if p and os.path.exists(p):
        return p
    here = os.path.join(os.path.dirname(__file__), "lpips_alex.npz")
    return here if os.path.exists(here) else None


def lpips_available() -> bool:
    return default_weights_path() is not None


@lru_cache(maxsize=2)
def _load_weights(path: str):
    z = np.load(path)
    convs = [(jnp.asarray(z[f"conv{i}.weight"]),
              jnp.asarray(z[f"conv{i}.bias"])) for i in range(5)]
    lins = [jnp.asarray(z[f"lin{i}.weight"]).reshape(-1) for i in range(5)]
    return convs, lins


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        "VALID")


def _features(x, convs):
    """x (N, 3, H, W) in [-1, 1] -> list of 5 relu feature maps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    for i, ((w, b), spec) in enumerate(zip(convs, _CONVS)):
        _, _, _, stride, pad = spec
        x = _conv(x, w, b, stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool3s2(x)
    return feats


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (n + eps)


def lpips(img0: jnp.ndarray, img1: jnp.ndarray,
          weights: Optional[str] = None) -> jnp.ndarray:
    """LPIPS distance between (3, H, W) or (N, 3, H, W) images in [0, 1].

    Raises FileNotFoundError if no weights file is available (see module
    docstring) — a random-weight LPIPS is not a meaningful metric.
    """
    path = weights or default_weights_path()
    if path is None:
        raise FileNotFoundError(
            "LPIPS weights not found: set GS_LPIPS_WEIGHTS or place "
            "lpips_alex.npz next to eval/lpips.py (see "
            "tools/convert_lpips_weights.py)")
    convs, lins = _load_weights(path)
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    x0 = img0 * 2.0 - 1.0
    x1 = img1 * 2.0 - 1.0
    f0 = _features(x0, convs)
    f1 = _features(x1, convs)
    total = 0.0
    for a, b, lw in zip(f0, f1, lins):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2   # (N, C, H, W)
        per_px = jnp.einsum("nchw,c->nhw", d, lw)
        total = total + jnp.mean(per_px, axis=(1, 2))
    return total


def make_random_weights(path: str, seed: int = 0) -> None:
    """Write a RANDOM-weight npz in the exact file format (for tests and
    for validating the converter round-trip; not a perceptual metric)."""
    rng = np.random.default_rng(seed)
    out = {}
    for i, (oc, ic, k, _, _) in enumerate(_CONVS):
        out[f"conv{i}.weight"] = rng.normal(
            0, 0.05, (oc, ic, k, k)).astype(np.float32)
        out[f"conv{i}.bias"] = np.zeros((oc,), np.float32)
    for i, (oc, _, _, _, _) in enumerate(_CONVS):
        out[f"lin{i}.weight"] = np.abs(
            rng.normal(0, 0.01, (oc,))).astype(np.float32)
    np.savez(path, **out)
