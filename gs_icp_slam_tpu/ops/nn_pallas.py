"""Pallas TPU kernel: masked 1-nearest-neighbor search.

The per-Gauss-Newton-iteration correspondence kernel of G-ICP
(SURVEY §2.9: fast_gicp's kd-tree query).  The XLA scan-over-chunks
version in knn.py materializes (Q, chunk) distance blocks in HBM every
iteration (~41 ms at 8k x 65k on v5e); here the distance block lives in
VMEM and only the running (best_d2, best_idx) per query ever leaves.

Layout: points are channel-first (3, N) so the MXU contraction
q^T r -> (BQ, BR) has queries on sublanes and refs on lanes; the |q|^2
term is constant per row and never affects the argmin, so it is added
once at the end outside the kernel.

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

_BIG = 3.4e38  # python float: jnp scalars become captured consts in pallas kernels


def _nn_kernel(q_ref, r_ref, rn_ref, out_d_ref, out_i_ref, *, br: int):
    rb = pl.program_id(1)

    q = q_ref[...]                     # (3, BQ)
    r = r_ref[...]                     # (3, BR)
    rn = rn_ref[...]                   # (1, BR) |r|^2, +BIG where invalid

    dots = jax.lax.dot_general(q, r, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (BQ, BR)
    m = rn - 2.0 * dots                # argmin_r of |q-r|^2 - |q|^2

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
            pl.BlockSpec((3, bq), lambda qb, rb: (0, qb),
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
def nn_search_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                     ref_valid: jnp.ndarray, bq: int = 256, br: int = 2048,
                     interpret: bool | None = None):
    """Masked 1-NN: same contract as knn.nn_search (idx, sqdist per query).

    query (Q, 3), ref (R, 3), ref_valid (R,) bool.  Invalid refs never
    match; with no valid ref at all, idx is garbage and sqdist ~ _BIG,
    matching the XLA version.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q, R = query.shape[0], ref.shape[0]
    q_pad = -(-Q // bq) * bq
    r_pad = -(-R // br) * br

    qT = jnp.zeros((3, q_pad), jnp.float32).at[:, :Q].set(query.T)
    rT = jnp.zeros((3, r_pad), jnp.float32).at[:, :R].set(ref.T)
    rn = jnp.sum(rT * rT, axis=0, keepdims=True)
    vmask = jnp.zeros((1, r_pad), bool).at[0, :R].set(ref_valid)
    rn = jnp.where(vmask, rn, _BIG)

    out_d, out_i = _make_nn(q_pad, r_pad, bq, br, interpret)(qT, rT, rn)
    qn = jnp.sum(query * query, axis=1)
    sqd = jnp.minimum(out_d[:Q, 0] + qn, _BIG)
    # clamp tiny negatives from the |q|^2 re-add
    sqd = jnp.maximum(sqd, 0.0)
    return out_i[:Q, 0], sqd
