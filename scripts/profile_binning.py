"""Slope-timed decomposition of the pair-binning stage (rasterize_tiled's
sort/ranges/cell_idx/payload) at bench geometry."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.utils.profiling import slope_time  # noqa: E402


def main():
    width, height = 1200, 680
    tile, D = 32, 2
    K, V = 384, 1 << 16
    ntx, nty = -(-width // tile), -(-height // tile)
    T = ntx * nty
    S = max(V - 1, 1).bit_length()
    SENT = jnp.int32(2 ** 31 - 1)
    rng = np.random.default_rng(0)

    # realistic keys: ~65% real pairs with clustered tiles
    real = rng.uniform(size=D * D * V) < 0.65
    tiles = rng.integers(0, T, D * D * V).astype(np.int32)
    vslot = np.tile(np.arange(V, dtype=np.int32), D * D)
    keys_np = np.where(real, (tiles.astype(np.int64) << S) | vslot,
                       2 ** 31 - 1).astype(np.int32)
    keys = jnp.asarray(keys_np)
    attr = jnp.asarray(rng.normal(size=(10, V + 1)).astype(np.float32))

    pair_id = jnp.arange(keys.shape[0], dtype=jnp.int32)

    def sort1(s):
        return jax.lax.sort(keys ^ jnp.int32(s))

    def sort2(s):
        return jax.lax.sort((keys ^ jnp.int32(s), pair_id), num_keys=1)

    key_s, pid_s = jax.jit(lambda k: jax.lax.sort(
        (k, pair_id), num_keys=1))(keys)

    def ranges(s):
        return jnp.searchsorted(
            key_s, (jnp.arange(T + 1, dtype=jnp.int32) << S) + jnp.int32(s),
            method="scan_unrolled").astype(jnp.int32)

    start = jax.jit(lambda: jnp.searchsorted(
        key_s, (jnp.arange(T + 1, dtype=jnp.int32) << S),
        method="scan_unrolled").astype(jnp.int32))()[:-1]

    def cellidx(s):
        rr = jnp.arange(key_s.shape[0], dtype=jnp.int32)
        t_of_r = jnp.clip((key_s ^ jnp.int32(s)) >> S, 0, T - 1)
        k_of_r = rr - start[t_of_r]
        cell_of_r = jnp.where((key_s != SENT) & (k_of_r < K),
                              t_of_r * K + k_of_r, T * K)
        return jnp.zeros_like(rr).at[pid_s].set(cell_of_r)

    pair_slot = jnp.minimum(key_s & ((1 << S) - 1), V)
    pair_slot_p = jnp.concatenate([pair_slot,
                                   jnp.full((K,), V, jnp.int32)])

    def payload(s):
        pay = (attr[:, pair_slot_p] + s).T
        return jnp.pad(pay, ((0, 0), (0, 118)))

    def vis_gather(s):
        order = pid_s[:V] % V
        return (attr + s)[:, order]

    for name, fn in [("sort 1-operand", sort1), ("sort 2-operand", sort2),
                     ("searchsorted T+1", ranges),
                     ("cell_idx arithmetic+scatter", cellidx),
                     ("payload gather+pad", payload),
                     ("compaction gather (16,V)", vis_gather)]:
        print(f"{name:28s} {slope_time(fn, R=8):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
