"""LPIPS (AlexNet and VGG16 variants) in pure JAX.

The reference evaluates LPIPS twice: in-process with torchmetrics' alex
variant (mp_Mapper.py:19,340) and offline with a bundled lpipsPyTorch vgg
variant (metrics.py:74).  Both are the same computation — a conv feature
trunk, per-layer unit-normalized feature differences, non-negative 1x1
linear calibration heads, spatial mean, layer sum — implemented directly
on lax.conv so it runs on TPU/CPU without torch.

Weights: this environment has no network egress and no torchvision, so
pretrained weights cannot be baked in.  Provide them as an .npz via the
`weights` argument or the GS_LPIPS_WEIGHTS env var; create that file on
any machine with internet using tools/convert_lpips_weights.py (reads
the official `lpips` pip package — alex or vgg).  Without weights,
`lpips_available()` is False and evaluation reports LPIPS as None — the
number would be meaningless with random features.

Note LPIPS(x, x) == 0 holds for ANY weights (the metric is a norm of
feature differences), which is what the unit tests pin down; the
converter round-trip is validated structurally in tests/test_cli_eval.py.
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Feature trunks (torchvision layout): per conv (out_c, in_c, k, stride,
# pad); pool_after = conv indices followed by a maxpool; taps = conv
# indices whose relu output feeds a calibration head.
_NETS = {
    "alex": dict(
        convs=[(64, 3, 11, 4, 2), (192, 64, 5, 1, 2), (384, 192, 3, 1, 1),
               (256, 384, 3, 1, 1), (256, 256, 3, 1, 1)],
        pool_after={0, 1},
        pool=(3, 2),  # kernel 3 stride 2
        taps=(0, 1, 2, 3, 4),
    ),
    # VGG16 features through relu5_3 (lpipsPyTorch/modules/networks.py
    # taps relu1_2, 2_2, 3_3, 4_3, 5_3 — the standard LPIPS-vgg trunk)
    "vgg": dict(
        convs=[(64, 3, 3, 1, 1), (64, 64, 3, 1, 1),
               (128, 64, 3, 1, 1), (128, 128, 3, 1, 1),
               (256, 128, 3, 1, 1), (256, 256, 3, 1, 1),
               (256, 256, 3, 1, 1),
               (512, 256, 3, 1, 1), (512, 512, 3, 1, 1),
               (512, 512, 3, 1, 1),
               (512, 512, 3, 1, 1), (512, 512, 3, 1, 1),
               (512, 512, 3, 1, 1)],
        pool_after={1, 3, 6, 9},
        pool=(2, 2),
        taps=(1, 3, 6, 9, 12),
    ),
}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> Optional[str]:
    p = os.environ.get("GS_LPIPS_WEIGHTS")
    if p and os.path.exists(p):
        return p
    here = os.path.dirname(__file__)
    for name in ("lpips_alex.npz", "lpips_vgg.npz"):
        cand = os.path.join(here, name)
        if os.path.exists(cand):
            return cand
    return None


def lpips_available() -> bool:
    return default_weights_path() is not None


@lru_cache(maxsize=2)
def _load_weights(path: str):
    z = np.load(path)
    net = str(z["net"]) if "net" in z.files else "alex"
    spec = _NETS[net]
    n = len(spec["convs"])
    convs = [(jnp.asarray(z[f"conv{i}.weight"]),
              jnp.asarray(z[f"conv{i}.bias"])) for i in range(n)]
    lins = [jnp.asarray(z[f"lin{i}.weight"]).reshape(-1)
            for i in range(len(spec["taps"]))]
    for i, (w, _) in enumerate(convs):  # schema validation
        oc, ic, k, _, _ = spec["convs"][i]
        assert w.shape == (oc, ic, k, k), (
            f"conv{i}.weight shape {w.shape} != {(oc, ic, k, k)} for "
            f"net={net}")
    return net, convs, lins


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID")


def _features(x, convs, spec):
    """x (N, 3, H, W) in [-1, 1] -> relu feature maps at the tap layers."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    taps = set(spec["taps"])
    pk, ps = spec["pool"]
    feats = []
    for i, ((w, b), conv_spec) in enumerate(zip(convs, spec["convs"])):
        _, _, _, stride, pad = conv_spec
        x = _conv(x, w, b, stride, pad)
        x = jax.nn.relu(x)
        if i in taps:
            feats.append(x)
        if i in spec["pool_after"]:
            x = _maxpool(x, pk, ps)
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
            "lpips_alex.npz / lpips_vgg.npz next to eval/lpips.py (see "
            "tools/convert_lpips_weights.py)")
    net, convs, lins = _load_weights(path)
    spec = _NETS[net]
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    x0 = img0 * 2.0 - 1.0
    x1 = img1 * 2.0 - 1.0
    f0 = _features(x0, convs, spec)
    f1 = _features(x1, convs, spec)
    total = 0.0
    for a, b, lw in zip(f0, f1, lins):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2   # (N, C, H, W)
        per_px = jnp.einsum("nchw,c->nhw", d, lw)
        total = total + jnp.mean(per_px, axis=(1, 2))
    return total


def make_random_weights(path: str, seed: int = 0, net: str = "alex") -> None:
    """Write a RANDOM-weight npz in the exact file format (for tests and
    for validating the converter round-trip; not a perceptual metric)."""
    rng = np.random.default_rng(seed)
    spec = _NETS[net]
    out = {"net": np.asarray(net)}
    for i, (oc, ic, k, _, _) in enumerate(spec["convs"]):
        out[f"conv{i}.weight"] = rng.normal(
            0, 0.05, (oc, ic, k, k)).astype(np.float32)
        out[f"conv{i}.bias"] = np.zeros((oc,), np.float32)
    for j, i in enumerate(spec["taps"]):
        oc = spec["convs"][i][0]
        out[f"lin{j}.weight"] = np.abs(
            rng.normal(0, 0.01, (oc,))).astype(np.float32)
    np.savez(path, **out)
