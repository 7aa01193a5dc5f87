"""A/B: (1) knn top_k vs iterative extraction at tracking shape;
(2) duplicate-index scatter-add vs unique-index permutation scatter +
reshape-reduce (the rasterizer backward's splat-gradient reduction)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.utils.profiling import slope_time  # noqa: E402
from gs_icp_slam_tpu.ops.knn import knn_search  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    Q = 8192
    pts = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32))
    valid = jnp.ones((Q,), bool)

    # scatter A/B at backward shape
    V = 1 << 16
    T, K = 3225, 256
    NP9 = 9 * V
    dblk = jnp.asarray(rng.normal(size=(T * K, 16)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, V + 1, T * K).astype(np.int32))
    # unique destinations for the dense cells (dense T*K cells > NP9
    # pairs; invalid cells go to distinct scratch rows so uniqueness
    # holds, as it does for real data where they drop)
    NDST = T * K + NP9
    perm = jnp.asarray(rng.permutation(NDST)[:T * K].astype(np.int32))

    def dup_scatter(s):
        si = slots + jnp.abs((s * 1e30).astype(jnp.int32)) % 2
        return jnp.zeros((16, V + 1), jnp.float32).at[:, si].add(
            dblk.T, mode="drop")

    def uniq_scatter(s):
        pi = perm + jnp.abs((s * 1e30).astype(jnp.int32)) % 2
        dpay = jnp.zeros((NDST + 1, 16), jnp.float32).at[pi, :].set(
            dblk, mode="drop", unique_indices=True)[:NP9]
        return jnp.sum(dpay.reshape(9, V, 16), axis=0)

    def uniq_scatter_cf(s):
        pi = perm + jnp.abs((s * 1e30).astype(jnp.int32)) % 2
        dpay = jnp.zeros((16, NDST + 1), jnp.float32).at[:, pi].set(
            dblk.T, mode="drop", unique_indices=True)[:, :NP9]
        return jnp.sum(dpay.reshape(16, 9, V), axis=1)

    print(f"dup scatter-add (16,V)      {slope_time(dup_scatter, R=8):8.3f}"
          " ms", flush=True)
    print(f"uniq row scatter+reduce     {slope_time(uniq_scatter, R=8):8.3f}"
          " ms", flush=True)
    print(f"uniq lane scatter+reduce    {slope_time(uniq_scatter_cf, R=8):8.3f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
