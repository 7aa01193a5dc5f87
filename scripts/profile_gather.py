"""Decisive gather A/B for the rasterizer redesign (slope-timed, see
utils/profiling.slope_time).  Variants map to design choices:

  g1  plain lane gather (16, M) flat idx     - is the raw gather fast?
  g2  g1 + swapaxes to (T, 16, K)            - does the layout swap cost?
  g3  composed two-level gather (current)     - rasterize.py's formulation
  g4  1D i32 key gather (ranges stage)        - tile_list build component
  g5  payload gather (10, 9V) + transpose     - the pair-payload design
  g6  scatter-add (16, V) from M rows         - the backward's cost class
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
    rng = np.random.default_rng(0)
    N = 1 << 18
    V = 1 << 16
    T, K = 3225, 256
    R = 16
    M = T * K
    NP9 = 9 * V

    table = jnp.asarray(rng.normal(size=(R, N + 1)).astype(np.float32))
    table_v = jnp.asarray(rng.normal(size=(10, V + 1)).astype(np.float32))
    vis_order = jnp.asarray(rng.integers(0, N, V + 1).astype(np.int32))
    tile_list = jnp.asarray(rng.integers(0, V + 1, (T, K)).astype(np.int32))
    full_flat = jnp.asarray(rng.integers(0, N + 1, M).astype(np.int32))
    key_s = jnp.asarray(np.sort(rng.integers(0, 2 ** 30, NP9))
                        .astype(np.int32))
    gpos = jnp.asarray(rng.integers(0, NP9, (T, K)).astype(np.int32))
    pair_slot = jnp.asarray(rng.integers(0, V + 1, NP9).astype(np.int32))
    grad = jnp.asarray(rng.normal(size=(10, NP9)).astype(np.float32))

    def salt_i(s):
        # 0/1 at runtime, data-dependent so iterations can't be CSE'd,
        # and small enough to keep the index distribution representative
        return jnp.abs((s * 1e30).astype(jnp.int32)) % 2

    cases = {
        "g1 lane gather (16,M)": lambda s: table[:, full_flat + salt_i(s)],
        "g2 g1+reshape+swap (T,16,K)": lambda s: jnp.swapaxes(
            table[:, (full_flat + salt_i(s)).reshape(T, K)], 0, 1),
        "g3 composed 2-level (current)": lambda s: jnp.swapaxes(
            table[:, jnp.concatenate(
                [vis_order[:-1],
                 jnp.full((1,), N, jnp.int32)])[tile_list + salt_i(s)]],
            0, 1),
        "g4 1D key gather 825k": lambda s: key_s[gpos + salt_i(s)],
        "g5 payload (10,9V)+transpose": lambda s: jnp.transpose(
            table_v[:, pair_slot + salt_i(s)]),
        "g6 scatter-add (10,V)<-9V": lambda s: jnp.zeros(
            (10, V + 1), jnp.float32).at[:, pair_slot + salt_i(s)].add(grad),
    }
    for name, fn in cases.items():
        ms = slope_time(fn, R=8)
        print(f"{name:34s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
