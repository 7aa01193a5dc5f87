"""Pallas TPU kernel: masked 1-nearest-neighbor search.

The per-Gauss-Newton-iteration correspondence kernel of G-ICP
(SURVEY §2.9: fast_gicp's kd-tree query).  The XLA scan-over-chunks
version in knn.py materializes (Q, chunk) distance blocks in HBM every
iteration (~41 ms at 8k x 65k on v5e); here the distance block lives in
VMEM and only the running (best_d2, best_idx) per query ever leaves.

The distance is computed on the VPU as sum_d (q_d - r_d)^2 with queries
on sublanes ((BQ, 1) columns) and refs on lanes ((1, BR) rows): a
dot-product formulation puts a K=3 contraction on the MXU, which runs at
3/128 of peak and measured 5.3 ms per call at 8k x 64k — the VPU
broadcast form is ~8x faster.  Invalid refs carry a +BIG additive bias.

Grid is (Q/BQ, R/BR) with the ref axis innermost; the output block only
depends on the query index, so the kernel accumulates the running min
across ref blocks in VMEM (TPU grid steps run sequentially).
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38  # python float: jnp scalars become captured consts in kernels


def _nn_kernel(q_ref, r_ref, bias_ref, out_d_ref, out_i_ref, *, br: int):
    rb = pl.program_id(1)

    qx = q_ref[:, 0:1]                 # (BQ, 1) sublane-major queries
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    rx = r_ref[0:1, :]                 # (1, BR) lane-major refs
    ry = r_ref[1:2, :]
    rz = r_ref[2:3, :]
    bias = bias_ref[...]               # (1, BR): 0 valid, +BIG invalid

    dx = qx - rx
    dy = qy - ry
    dz = qz - rz
    m = dx * dx + dy * dy + dz * dz + bias          # (BQ, BR) pure VPU

    d_blk = jnp.min(m, axis=1, keepdims=True)                   # (BQ, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    i_blk = jnp.min(jnp.where(m <= d_blk, lane, jnp.int32(2 ** 30)),
                    axis=1, keepdims=True) + rb * br            # (BQ, 1)

    @pl.when(rb == 0)
    def _init():
        out_d_ref[...] = jnp.full_like(out_d_ref, 3.4e38)
        out_i_ref[...] = jnp.zeros_like(out_i_ref)

    best_d = out_d_ref[...]
    upd = d_blk < best_d
    out_d_ref[...] = jnp.where(upd, d_blk, best_d)
    out_i_ref[...] = jnp.where(upd, i_blk, out_i_ref[...])


@functools.lru_cache(maxsize=None)
def _make_nn(q_pad: int, r_pad: int, bq: int, br: int, interpret: bool):
    grid = (q_pad // bq, r_pad // br)
    kernel = partial(_nn_kernel, br=br)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, 3), lambda qb, rb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, br), lambda qb, rb: (0, rb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br), lambda qb, rb: (0, rb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, 1), lambda qb, rb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda qb, rb: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("bq", "br", "interpret"))
def nn_search_pre(query: jnp.ndarray, rT: jnp.ndarray, bias: jnp.ndarray,
                  bq: int = 512, br: int = 4096,
                  interpret: bool | None = None):
    """1-NN against a PREFETCHED reference: rT (3, Tp) channel-first points
    and bias (1, Tp) additive validity bias (0 valid, +BIG invalid), Tp a
    multiple of br.  This is the G-ICP inner-loop entry: the target is
    fixed across Gauss-Newton iterations, so its layout is prepared once
    at construction (ops/gicp.py GICPTarget)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q = query.shape[0]
    r_pad = rT.shape[1]
    assert r_pad % br == 0, (r_pad, br)
    q_pad = -(-Q // bq) * bq
    qS = jnp.zeros((q_pad, 3), jnp.float32).at[:Q].set(query)
    out_d, out_i = _make_nn(q_pad, r_pad, bq, br, interpret)(qS, rT, bias)
    return out_i[:Q, 0], jnp.minimum(out_d[:Q, 0], _BIG)


def _knn_kernel(q_ref, r_ref, bias_ref, idx_ref, sqd_ref, *, k: int,
                kp: int):
    """k smallest distances by iterative extraction, whole ref resident.

    The (BQ, R) distance block lives in VMEM; k passes of
    (min, argmin-by-tie-break, mask) emit (BQ, kp) outputs (kp = k padded
    to the sublane granule).  For the tracking covariance search
    (Q=R~8k, k=20) this replaces knn.knn_search's lax.top_k (a full
    per-row sort) and its HBM-materialized distance blocks."""
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    rx = r_ref[0:1, :]
    ry = r_ref[1:2, :]
    rz = r_ref[2:3, :]
    bias = bias_ref[...]

    dx = qx - rx
    dy = qy - ry
    dz = qz - rz
    m = dx * dx + dy * dy + dz * dz + bias            # (BQ, R)
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)

    idxs, vals = [], []
    for _ in range(k):
        d = jnp.min(m, axis=1, keepdims=True)                    # (BQ, 1)
        i = jnp.min(jnp.where(m <= d, lane, jnp.int32(2 ** 30)),
                    axis=1, keepdims=True)
        idxs.append(i)
        vals.append(jnp.minimum(d, _BIG))
        m = jnp.where(lane == i, _BIG, m)
    pad = kp - k
    if pad:
        idxs.append(jnp.zeros((m.shape[0], pad), jnp.int32))
        vals.append(jnp.full((m.shape[0], pad), _BIG, jnp.float32))
    idx_ref[...] = jnp.concatenate(idxs, axis=1)
    sqd_ref[...] = jnp.concatenate(vals, axis=1)


@functools.lru_cache(maxsize=None)
def _make_knn(q_pad: int, r_pad: int, bq: int, k: int, kp: int,
              interpret: bool):
    grid = (q_pad // bq,)
    return pl.pallas_call(
        partial(_knn_kernel, k=k, kp=kp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, 3), lambda qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r_pad), lambda qb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad), lambda qb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, kp), lambda qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, kp), lambda qb: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, kp), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, kp), jnp.float32),
        ],
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("k", "bq", "interpret"))
def knn_search_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                      ref_valid: jnp.ndarray, k: int = 20, bq: int = 256,
                      interpret: bool | None = None):
    """k-NN with the whole reference VMEM-resident (fits for R <~ 64k at
    bq=256: the (bq, R) distance block is the VMEM budget).  Same contract
    as knn.knn_search: (idx (Q, k) nearest-first, sqd (Q, k))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q = query.shape[0]
    R = ref.shape[0]
    r_pad = -(-R // 512) * 512
    q_pad = -(-Q // bq) * bq
    kp = -(-k // 8) * 8
    rT = jnp.zeros((3, r_pad), jnp.float32).at[:, :R].set(ref.T)
    vmask = jnp.zeros((1, r_pad), bool).at[0, :R].set(ref_valid)
    bias = jnp.where(vmask, 0.0, _BIG)
    qS = jnp.zeros((q_pad, 3), jnp.float32).at[:Q].set(query)
    idx, sqd = _make_knn(q_pad, r_pad, bq, k, kp, interpret)(qS, rT, bias)
    return idx[:Q, :k], sqd[:Q, :k]


@partial(jax.jit, static_argnames=("bq", "br", "interpret"))
def nn_search_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                     ref_valid: jnp.ndarray, bq: int = 512, br: int = 4096,
                     interpret: bool | None = None):
    """Masked 1-NN: same contract as knn.nn_search (idx, sqdist per query).

    query (Q, 3), ref (R, 3), ref_valid (R,) bool.  Invalid refs never
    match; with no valid ref at all, idx is garbage and sqdist ~ _BIG,
    matching the XLA version.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = ref.shape[0]
    r_pad = -(-R // br) * br
    rT = jnp.zeros((3, r_pad), jnp.float32).at[:, :R].set(ref.T)
    vmask = jnp.zeros((1, r_pad), bool).at[0, :R].set(ref_valid)
    bias = jnp.where(vmask, 0.0, _BIG)
    return nn_search_pre(query, rT, bias, bq=bq, br=br, interpret=interpret)
