"""The Gaussian map: a fixed-capacity pytree of padded arrays in HBM.

Replaces the reference's `GaussianModel` (scene/gaussian_model.py:26), whose
dynamic torch.cat/boolean-index "optimizer surgery" (cat :450, prune :427)
cannot exist under XLA's static shapes.  Instead:

  * capacity C is fixed up front; `n` counts allocated slots (high-water mark)
    and `live` marks slots that are allocated and not pruned.  The reference
    already works this way at its IPC boundary (fixed-size prefix-counted
    shared buffers, scene/shared_objs.py:44-126), so the idiom is 1:1.
  * append = masked scatter at the tail (add_from_pcd2_tensor,
    gaussian_model.py:165).
  * prune = clearing `live` bits (prune_large_and_transparent,
    gaussian_model.py:580-592); dead slots are skipped by rendering and by
    the masked Adam, and `compact()` reclaims them outside the hot loop.

Parameter semantics match the reference exactly:
  xyz           world position
  f_dc          SH degree-0 coefficients, RGB2SH(color)
  f_rest        higher SH bands ((sh_degree+1)^2-1 of them; 0 in SLAM mode)
  log_scaling   log of gaussian extents; initialized from G-ICP covariance
                scales divided by clamp((z^1.5)*2, min=1)
                (gaussian_model.py:142-144 — depth-aware shrink of far points)
  rotation      xyzw quaternion (un-normalized storage, normalized activation)
  opacity_logit inverse_sigmoid of opacity, init 0.1 (gaussian_model.py:147)
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.quat import quat_normalize
from ..utils.sh import rgb_to_sh


class GaussianMap(NamedTuple):
    xyz: jnp.ndarray            # (C, 3) float32
    f_dc: jnp.ndarray           # (C, 3) float32
    f_rest: jnp.ndarray         # (C, R, 3) float32, R = (sh+1)^2 - 1
    log_scaling: jnp.ndarray    # (C, 3) float32
    rotation: jnp.ndarray       # (C, 4) float32 xyzw
    opacity_logit: jnp.ndarray  # (C, 1) float32
    trackable: jnp.ndarray      # (C,) bool — eligible as G-ICP target
    live: jnp.ndarray           # (C,) bool — allocated and not pruned
    n: jnp.ndarray              # () int32 — slots ever allocated

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    # --- activations (gaussian_model.py:105-125) ---
    @property
    def scaling(self) -> jnp.ndarray:
        return jnp.exp(self.log_scaling)

    @property
    def rotation_normalized(self) -> jnp.ndarray:
        return quat_normalize(self.rotation)

    @property
    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logit)

    @property
    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.live.astype(jnp.int32))


_PARAM_FIELDS = ("xyz", "f_dc", "f_rest", "log_scaling", "rotation",
                 "opacity_logit")


def map_params(m: GaussianMap) -> dict:
    """The trainable-parameter subtree (what Adam sees)."""
    return {f: getattr(m, f) for f in _PARAM_FIELDS}


def with_params(m: GaussianMap, params: dict) -> GaussianMap:
    return m._replace(**params)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def empty_map(capacity: int, sh_degree: int = 0) -> GaussianMap:
    r = (sh_degree + 1) ** 2 - 1
    f32 = jnp.float32
    return GaussianMap(
        xyz=jnp.zeros((capacity, 3), f32),
        f_dc=jnp.zeros((capacity, 3), f32),
        f_rest=jnp.zeros((capacity, r, 3), f32),
        log_scaling=jnp.zeros((capacity, 3), f32),
        # identity quat so dead slots stay numerically benign
        rotation=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], f32), (capacity, 1)),
        opacity_logit=jnp.full((capacity, 1), -10.0, f32),
        trackable=jnp.zeros((capacity,), bool),
        live=jnp.zeros((capacity,), bool),
        n=jnp.int32(0),
    )


def _gicp_log_scales(scales: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Reference scale init (gaussian_model.py:142-144): the G-ICP covariance
    sqrt-eigenvalues are shrunk by clamp((z^1.5)*2, min=1) before log."""
    z = jnp.maximum((z_vals ** 1.5) * 2.0, 1.0)
    return jnp.log(jnp.maximum(scales, 1e-12) / z[:, None])


def add_gaussians(m: GaussianMap, points: jnp.ndarray, colors: jnp.ndarray,
                  quats: jnp.ndarray, scales: jnp.ndarray,
                  z_vals: jnp.ndarray, trackable: jnp.ndarray,
                  valid: jnp.ndarray,
                  init_opacity: float = 0.1) -> GaussianMap:
    """Append the valid subset of a candidate batch at the tail.

    Implements both create_from_pcd2_tensor (first keyframe,
    gaussian_model.py:134) and add_from_pcd2_tensor (:165): same math, the
    only difference upstream is cat vs fresh alloc, which the static
    capacity erases.

    Args (all batch P, padded):
      points (P,3) world xyz; colors (P,3) in [0,1]; quats (P,4) xyzw from
      G-ICP covariance eigenbasis; scales (P,3) sqrt-eigenvalues; z_vals (P,)
      camera-frame depth; trackable (P,) bool; valid (P,) bool — only valid
      rows are inserted.
    """
    P = points.shape[0]
    C = m.capacity
    # Stable partition: valid rows first, preserving order.
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    count = jnp.sum(valid.astype(jnp.int32))

    pts = points[order]
    cols = colors[order]
    qts = quats[order]
    scl = scales[order]
    zv = z_vals[order]
    trk = trackable[order]

    slot = m.n + jnp.arange(P, dtype=jnp.int32)
    ok = (jnp.arange(P) < count) & (slot < C)
    # Out-of-range writes dropped via mode='drop' (slot=C for masked rows).
    slot = jnp.where(ok, slot, C)

    new = dict(
        xyz=m.xyz.at[slot].set(pts, mode="drop"),
        f_dc=m.f_dc.at[slot].set(rgb_to_sh(cols), mode="drop"),
        log_scaling=m.log_scaling.at[slot].set(_gicp_log_scales(scl, zv),
                                               mode="drop"),
        rotation=m.rotation.at[slot].set(qts, mode="drop"),
        opacity_logit=m.opacity_logit.at[slot].set(
            jnp.full((P, 1), math.log(init_opacity / (1.0 - init_opacity)),
                     jnp.float32),
            mode="drop"),
        trackable=m.trackable.at[slot].set(trk, mode="drop"),
        live=m.live.at[slot].set(True, mode="drop"),
        n=jnp.minimum(m.n + count, C),
    )
    if m.f_rest.shape[1] > 0:
        new["f_rest"] = m.f_rest.at[slot].set(
            jnp.zeros((P,) + m.f_rest.shape[1:]), mode="drop")
    return m._replace(**new)


def prune_large_and_transparent(m: GaussianMap, min_opacity: float,
                                extent: float | None) -> GaussianMap:
    """prune_large_and_transparent (gaussian_model.py:580-592): drop slots
    with opacity < min_opacity or max scale > 0.1 * extent."""
    kill = m.opacity[:, 0] < min_opacity
    if extent is not None:
        kill = kill | (jnp.max(m.scaling, axis=-1) > 0.1 * extent)
    return m._replace(live=m.live & ~kill)


def trackable_export(m: GaussianMap, opacity_th: float, out_capacity: int):
    """get_trackable_gaussians_tensor (gaussian_model.py:207-215): the
    (xyz, normalized rotation, exp scaling) of live trackable gaussians with
    opacity above the threshold, compacted into a fixed-size buffer.

    Returns (points (K,3), rots (K,4), scales (K,3), valid (K,) bool).
    """
    mask = m.live & m.trackable & (m.opacity[:, 0] > opacity_th)
    order = jnp.argsort(jnp.logical_not(mask), stable=True)[:out_capacity]
    count = jnp.sum(mask.astype(jnp.int32))
    valid = jnp.arange(out_capacity) < count
    return (m.xyz[order], m.rotation_normalized[order], m.scaling[order],
            valid)


def densify_clone_split(m: GaussianMap, grad_norm: jnp.ndarray,
                        extent: float, rng: jnp.ndarray,
                        grad_threshold: float = 2e-4,
                        percent_dense: float = 0.01,
                        max_new: int = 4096) -> GaussianMap:
    """Adaptive density control: densify_and_clone / densify_and_split
    (gaussian_model.py:494-541).

    The reference DEFINES these but the SLAM mapper never calls them
    (SURVEY §3.3 note) — density comes from keyframe insertion.  Provided
    behind MapConfig.densify_enabled for vanilla-3DGS workflows.

    Args:
      grad_norm (C,): per-gaussian positional gradient norm (the reference
        accumulates viewspace-point grads; any consistent xyz-grad norm
        works as the trigger signal).
      extent: scene extent; small/large split at percent_dense * extent.
      rng: PRNG key for the split samples.
      max_new: static cap on selected gaussians per call (each yields two
        rows: a copy/sample pair).
    """
    C = m.capacity
    max_new = min(max_new, C)
    scal = m.scaling
    big = jnp.max(scal, axis=-1) > percent_dense * extent
    hot = m.live & (grad_norm >= grad_threshold)
    sel_clone = hot & ~big
    sel_split = hot & big
    sel = sel_clone | sel_split

    order = jnp.argsort(jnp.logical_not(sel), stable=True)[:max_new]
    count = jnp.minimum(jnp.sum(sel.astype(jnp.int32)), max_new)
    ok = jnp.arange(max_new) < count

    xyz = m.xyz[order]
    f_dc = m.f_dc[order]
    f_rest = m.f_rest[order]
    logs = m.log_scaling[order]
    rot = m.rotation[order]
    opl = m.opacity_logit[order]
    trk = m.trackable[order]
    is_split = sel_split[order]

    # split: two samples from N(xyz, Sigma) with scales / 1.6
    # (gaussian_model.py:494-521); clone: exact copies (:523-541)
    from ..ops.projection import covariance_3d

    eps = jax.random.normal(rng, (2, max_new, 3))
    L = jnp.linalg.cholesky(
        covariance_3d(rot, jnp.exp(logs))
        + 1e-12 * jnp.eye(3, dtype=logs.dtype))
    offs = jnp.einsum("nij,snj->sni", L, eps)          # (2, max_new, 3)
    split_logs = logs - jnp.log(1.6)

    row_a_xyz = jnp.where(is_split[:, None], xyz + offs[0], xyz)
    row_a_logs = jnp.where(is_split[:, None], split_logs, logs)
    row_b_xyz = xyz + offs[1]
    row_b_ok = ok & is_split

    def put(base, rows_a, rows_b, ok_a, ok_b):
        slot_a = m.n + jnp.cumsum(ok_a.astype(jnp.int32)) - 1
        n_a = jnp.sum(ok_a.astype(jnp.int32))
        slot_b = m.n + n_a + jnp.cumsum(ok_b.astype(jnp.int32)) - 1
        slot_a = jnp.where(ok_a & (slot_a < C), slot_a, C)
        slot_b = jnp.where(ok_b & (slot_b < C), slot_b, C)
        return (base.at[slot_a].set(rows_a, mode="drop")
                .at[slot_b].set(rows_b, mode="drop"))

    ok_a = ok
    ok_b = row_b_ok
    n_added = (jnp.sum(ok_a.astype(jnp.int32))
               + jnp.sum(ok_b.astype(jnp.int32)))

    new = m._replace(
        xyz=put(m.xyz, row_a_xyz, row_b_xyz, ok_a, ok_b),
        f_dc=put(m.f_dc, f_dc, f_dc, ok_a, ok_b),
        f_rest=put(m.f_rest, f_rest, f_rest, ok_a, ok_b),
        log_scaling=put(m.log_scaling, row_a_logs, split_logs, ok_a, ok_b),
        rotation=put(m.rotation, rot, rot, ok_a, ok_b),
        opacity_logit=put(m.opacity_logit, opl, opl, ok_a, ok_b),
        trackable=put(m.trackable, trk, trk, ok_a, ok_b),
        live=put(m.live, ok_a, ok_b, ok_a, ok_b),
        n=jnp.minimum(m.n + n_added, C),
    )
    # split originals are pruned (the reference's prune_filter after split)
    kill = jnp.zeros((C,), bool).at[
        jnp.where(ok & is_split, order, C)].set(True, mode="drop")
    return new._replace(live=new.live & ~kill)


def compact(m: GaussianMap, extra_trees=()):
    """Squeeze dead slots out so the tail is free again.

    Outside the hot loop (prune only clears bits there).  `extra_trees` are
    pytrees of per-slot arrays permuted identically (e.g. Adam m/v) — dead
    rows are zeroed so a revived slot starts with fresh optimizer state, the
    same as the reference's cat-with-zeros surgery (gaussian_model.py:450).
    """
    C = m.capacity
    order = jnp.argsort(jnp.logical_not(m.live), stable=True)
    count = jnp.sum(m.live.astype(jnp.int32))
    keep = jnp.arange(C) < count

    def perm(x):
        return x[order]

    def perm_zero(x):
        y = x[order]
        mask_shape = (C,) + (1,) * (y.ndim - 1)
        return jnp.where(keep.reshape(mask_shape), y, jnp.zeros_like(y))

    out = m._replace(
        xyz=perm(m.xyz), f_dc=perm(m.f_dc), f_rest=perm(m.f_rest),
        log_scaling=perm(m.log_scaling), rotation=perm(m.rotation),
        opacity_logit=perm(m.opacity_logit),
        trackable=perm(m.trackable) & keep,
        live=keep,
        n=count,
    )
    extras = tuple(jax.tree.map(perm_zero, t) for t in extra_trees)
    return (out,) + extras if extras else out
