"""Neighbor search on TPU: brute force, MXU-shaped, static shapes.

The reference relies on a PCL kd-tree inside fast_gicp (SURVEY §2.9).  Trees
are pointer-chasing and hostile to TPUs; instead we compute distances as
   d2(a, b) = |a|^2 - 2 a.b + |b|^2
so the inner product rides the MXU, and reduce on the fly over reference
chunks so the full distance matrix is never materialized in HBM.

Two entry points:
  nn_search : 1-NN (index + squared distance) of each query in a masked
              reference set — the per-GN-iteration correspondence kernel.
  knn_search: k-NN indices for covariance estimation (includes self when
              query == ref, like fast_gicp's kd-tree search).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.4e38)


def _sq_norms(x):
    return jnp.sum(x * x, axis=-1)


@partial(jax.jit, static_argnames=("chunk", "use_pallas"))
def nn_search(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
              chunk: int = 4096, use_pallas=None):
    """1-NN of each query point in the valid subset of ref.

    Args:
      query: (Q, 3) float32.
      ref: (R, 3) float32, R a multiple of `chunk` is not required.
      ref_valid: (R,) bool — invalid slots never match.
      use_pallas: None = auto (VMEM-resident Pallas kernel on TPU; the
        XLA scan fallback elsewhere — it materializes (Q, chunk) blocks
        in HBM and measured 20x slower at tracking geometry).
    Returns:
      idx: (Q,) int32 index into ref (garbage if no valid ref at all).
      sqdist: (Q,) float32 squared distance (_BIG where no valid match).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .nn_pallas import nn_search_pallas
        return nn_search_pallas(query, ref, ref_valid)
    Q = query.shape[0]
    R = ref.shape[0]
    pad = (-R) % chunk
    if pad:
        ref = jnp.concatenate([ref, jnp.zeros((pad, 3), ref.dtype)], axis=0)
        ref_valid = jnp.concatenate([ref_valid, jnp.zeros((pad,), bool)], axis=0)
    n_chunks = ref.shape[0] // chunk

    q_norm = _sq_norms(query)  # (Q,)
    ref_c = ref.reshape(n_chunks, chunk, 3)
    valid_c = ref_valid.reshape(n_chunks, chunk)

    def body(carry, inp):
        best_d, best_i = carry
        r, v, base = inp
        # (Q, chunk) distances via MXU
        dots = query @ r.T
        d2 = q_norm[:, None] - 2.0 * dots + _sq_norms(r)[None, :]
        d2 = jnp.where(v[None, :], d2, _BIG)
        c_arg = jnp.argmin(d2, axis=1)
        c_min = jnp.take_along_axis(d2, c_arg[:, None], axis=1)[:, 0]
        upd = c_min < best_d
        best_d = jnp.where(upd, c_min, best_d)
        best_i = jnp.where(upd, base + c_arg.astype(jnp.int32), best_i)
        return (best_d, best_i), None

    init = (jnp.full((Q,), _BIG, jnp.float32), jnp.zeros((Q,), jnp.int32))
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (best_d, best_i), _ = jax.lax.scan(body, init, (ref_c, valid_c, bases))
    return best_i, best_d


@partial(jax.jit, static_argnames=())
def mean_sq_dist_3nn(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance of each point to its 3 nearest neighbors.

    The simple-knn submodule's distCUDA2 (SURVEY §2.11: imported by
    scene/gaussian_model.py:20 for vanilla-3DGS scale initialization;
    the SLAM path replaces it with G-ICP covariance scales).  Provided
    for offline/vanilla-3DGS compatibility.
    """
    idx, sqd = knn_search(points, points, valid, k=4)  # self + 3 NN
    # the self-match (distance 0) sorts first; average the next three
    d = jnp.where(jnp.isfinite(sqd[:, 1:4]) & (sqd[:, 1:4] < 1e37),
                  sqd[:, 1:4], 0.0)
    out = jnp.mean(d, axis=1)
    return jnp.where(valid, out, 0.0)


def _topk_smallest_iter(d2: jnp.ndarray, k: int):
    """k smallest per row by iterative extraction: k passes of
    (min, argmin, mask) on the (Q, R) block.  For small k this beats
    lax.top_k on TPU, which lowers to a full per-row sort."""
    R = d2.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    idxs, vals = [], []
    for _ in range(k):
        a = jnp.argmin(d2, axis=1).astype(jnp.int32)       # (Q,)
        m = jnp.min(d2, axis=1)
        idxs.append(a)
        vals.append(m)
        d2 = jnp.where(lane == a[:, None], _BIG, d2)
    return (jnp.stack(idxs, axis=1), jnp.stack(vals, axis=1))


@partial(jax.jit, static_argnames=("k", "q_chunk", "method", "use_pallas"))
def knn_search(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
               k: int = 20, q_chunk: int = 1024, method: str = "auto",
               use_pallas: bool | None = None):
    """k-NN indices of each query in ref (self included if query == ref).

    Processes query chunks against the full reference (distance rows live in
    VMEM-sized blocks); suited to the per-frame source cloud (~10^4 points).

    method: "auto" = Pallas VMEM-resident kernel on TPU when the reference
    fits (R <= 32k), else "iter"; "iter" extracts the k minima one by one
    in XLA (k VPU passes — beats "topk"'s per-row lax.top_k sort).

    Returns:
      idx: (Q, k) int32, nearest first.
      sqd: (Q, k) float32 (_BIG where fewer than k valid refs exist).
    """
    if method == "auto":
        # use_pallas None = key off the process default backend; pass an
        # explicit False when running on a mesh whose devices are not the
        # default backend (the virtual-CPU dryrun mesh under a TPU plugin)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas and ref.shape[0] <= (1 << 15):
            from .nn_pallas import knn_search_pallas
            return knn_search_pallas(query, ref, ref_valid, k=k)
        method = "iter"
    Q = query.shape[0]
    pad_q = (-Q) % q_chunk
    if pad_q:
        query = jnp.concatenate([query, jnp.zeros((pad_q, 3), query.dtype)], axis=0)
    nq = query.shape[0] // q_chunk
    r_norm = jnp.where(ref_valid, _sq_norms(ref), _BIG)

    def body(q):
        d2 = _sq_norms(q)[:, None] - 2.0 * (q @ ref.T) + r_norm[None, :]
        d2 = jnp.where(ref_valid[None, :], d2, _BIG)
        if method == "iter":
            return _topk_smallest_iter(d2, k)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg_d

    idx, sqd = jax.lax.map(body, query.reshape(nq, q_chunk, 3))
    idx = idx.reshape(-1, k)[:Q]
    sqd = sqd.reshape(-1, k)[:Q]
    return idx, sqd


def resolve_grid_span(k: int, span: int = 0) -> int:
    """Resolve GICPConfig.grid_knn_span's auto sentinel (span <= 0): the
    smallest window holding >= ~2.4*k candidates, so the k-NN selection
    stays a real selection — a window of only ~k candidates degenerates to
    "the whole block is the neighbourhood" and biases covariances toward
    fixed image blocks (round-3 root cause of the rotation-stress ATE
    regression; see PROFILE_r03.json known_issues).

    The ONE home of the auto-span heuristic (ADVICE r3): make_source and
    every profiling script resolve spans through here.
    """
    if span > 0:
        return span
    span = 1
    while (2 * span + 1) ** 2 < 2.4 * k:
        span += 1
    return span


@partial(jax.jit, static_argnames=("gh", "gw", "k", "span"))
def knn_search_grid(points: jnp.ndarray, valid: jnp.ndarray, gh: int,
                    gw: int, k: int = 20, span: int = 2):
    """k-NN restricted to a (2*span+1)^2 image-grid window: O(S*W^2).

    span <= 0 means auto (resolve_grid_span).

    The per-frame source cloud IS a regular pixel-grid subsample
    (mp_Tracker.py:415-431 / make_downsample_filter), stored row-major as
    (gh*gw, 3), so a point's k=20 3D-nearest neighbours lie inside a small
    grid window wherever the surface is locally smooth; across depth
    discontinuities, far-in-3D window candidates lose to near ones exactly
    as under the exact search.  Every candidate is a STATIC slice of the
    padded grid — no gathers, no (S, S) distance matrix, ~10x cheaper than
    the exact source-covariance search at tracking geometry.

    Missing candidates (frame border, invalid depth, window exhausted)
    come back as (self-index, _BIG): covariance estimation then re-centers
    on a smaller effective neighbourhood instead of pulling in a bogus
    far neighbour.

    Returns (idx (S, k) int32 nearest-first, sqd (S, k) float32) — the
    knn_search contract.
    """
    span = resolve_grid_span(k, span)
    W = 2 * span + 1
    assert k <= W * W, (k, W)
    S = gh * gw
    pts_g = points.reshape(gh, gw, 3)
    pad_pts = jnp.pad(pts_g, ((span, span), (span, span), (0, 0)))
    pad_ok = jnp.pad(valid.reshape(gh, gw),
                     ((span, span), (span, span)))
    idx_g = jnp.arange(S, dtype=jnp.int32).reshape(gh, gw)
    pad_idx = jnp.pad(idx_g, ((span, span), (span, span)))

    cand_d, cand_i = [], []
    for dy in range(W):
        for dx in range(W):
            q = pad_pts[dy:dy + gh, dx:dx + gw]
            ok = pad_ok[dy:dy + gh, dx:dx + gw]
            d2 = jnp.sum((q - pts_g) ** 2, axis=-1)
            cand_d.append(jnp.where(ok, d2, _BIG))
            cand_i.append(pad_idx[dy:dy + gh, dx:dx + gw])
    # selection runs in the native (W^2, gh, gw) layout: lanes = gw, and
    # the argmin over candidates is a W^2-deep compare tree of (gh, gw)
    # tiles — measured ~4x faster than reshaping to an (S, W^2) matrix
    # whose 25-lane rows pad to 128
    d2 = jnp.stack(cand_d, axis=0)                         # (W^2, gh, gw)
    ci = jnp.stack(cand_i, axis=0)
    cand = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)

    idxs, vals = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=0)                            # (gh, gw)
        a = jnp.min(jnp.where(d2 <= m[None], cand, W * W), axis=0)
        sel = cand == a[None]
        idxs.append(jnp.sum(jnp.where(sel, ci, 0), axis=0))
        vals.append(m)
        d2 = jnp.where(sel, _BIG, d2)
    sqd = jnp.stack(vals, axis=-1).reshape(S, k)
    idx = jnp.stack(idxs, axis=-1).reshape(S, k)
    self_i = jnp.arange(S, dtype=jnp.int32)[:, None]
    return jnp.where(sqd < _BIG, idx, self_i), sqd
