"""Slope-timed decomposition of the window-compositor BACKWARD at bench
load: reverse Pallas kernel vs the dense-cell dup scatter vs the rest of
the VJP chain (projection/attr backward).

Bench geometry: 1200x680, 32-px tiles (T=836), K=128, V=65536,
~50k live splats -> ~170k real pairs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.utils.profiling import slope_time  # noqa: E402


def main():
    from gs_icp_slam_tpu.ops.composite_pallas import (build_cell_idx_np,
                                                      make_composite_win)

    width, height = 1200, 680
    tile = 32
    ntx, nty = -(-width // tile), -(-height // tile)
    T = ntx * nty
    K = int(os.environ.get("K", "128"))
    V = 1 << 16
    NP = 4 * V  # D^2 * V pair rows

    rng = np.random.default_rng(0)
    comp = make_composite_win(T, ntx, tile, K)
    fwd_call, bwd_call, _payload = comp.parts

    # synthetic but occupancy-realistic: ~170k real pairs spread over tiles
    counts = np.minimum(rng.poisson(200, T), K).astype(np.int32)
    starts = np.zeros(T, np.int32)
    starts[1:] = np.cumsum(counts)[:-1].astype(np.int32)
    pair_slot = rng.integers(0, V, NP).astype(np.int32)
    attr_v16 = rng.normal(size=(16, V)).astype(np.float32) * 0.01
    counts_j = jnp.asarray(counts)
    starts_j = jnp.asarray(starts)
    pair_slot_j = jnp.asarray(pair_slot)
    cell_idx_j = jnp.asarray(
        build_cell_idx_np(counts, starts, pair_slot, T, K, V))
    attr_j = jnp.asarray(attr_v16)
    g = jnp.asarray(rng.normal(size=(T, 8, tile * tile)).astype(np.float32))

    payload = jax.jit(_payload)(pair_slot_j, attr_j)
    out, taccs, nact = jax.jit(fwd_call)(counts_j, starts_j, payload)

    def t_payload(s):
        return _payload(pair_slot_j, attr_j + s)

    def t_fwd(s):
        return fwd_call(counts_j, starts_j, payload + s)[0]

    def t_bwdk(s):
        return bwd_call(counts_j, starts_j, nact, payload + s, taccs, out, g)

    dblk = jax.jit(lambda s: bwd_call(counts_j, starts_j, nact,
                                      payload + s, taccs, out, g))(0.0)

    def t_gather(s):
        ok = (cell_idx_j < T * K).astype(jnp.float32)
        idx = jnp.minimum(cell_idx_j, T * K - 1)
        return jnp.sum((dblk + s)[:, idx] * ok[None], axis=1)

    def t_full_vjp(s):
        def f(a):
            return jnp.sum(comp(counts_j, starts_j, pair_slot_j,
                                cell_idx_j, a) * g)
        return jax.grad(f)(attr_j + s)

    for name, fn in [("payload gather", t_payload), ("fwd kernel", t_fwd),
                     ("bwd kernel", t_bwdk), ("cell gather", t_gather),
                     ("full vjp", t_full_vjp)]:
        print(f"{name:16s} {slope_time(fn, R=8):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
