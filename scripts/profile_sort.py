"""Micro-bench: TPU cost of the pair-sort/binning variants and NN search."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _checksum(out):
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype")]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves[:1])


def timeit(name, fn, *args, n=10, **kw):
    float(jax.device_get(_checksum(fn(*args, **kw))))
    t0 = time.time()
    acc = []
    for _ in range(n):
        acc.append(_checksum(fn(*args, **kw)))
    float(jax.device_get(sum(acc)))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:46s} {dt:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    V = 1 << 16
    D2 = 9
    Np = V * D2
    tiles = jnp.asarray(rng.integers(0, 3226, Np).astype(np.int32))
    depths = jnp.asarray(rng.uniform(0.1, 10, Np).astype(np.float32))
    vals = jnp.asarray(rng.integers(0, V, Np).astype(np.int32))

    @jax.jit
    def sort2key(t, d, v):
        return jax.lax.sort((t, d, v), num_keys=2)

    timeit(f"2-key sort (int,f32)+val  n={Np}", sort2key, tiles, depths, vals)

    @jax.jit
    def sort1key(t, v):
        return jax.lax.sort((t, v), num_keys=1, is_stable=True)

    timeit(f"1-key stable int sort+val n={Np}", sort1key, tiles, vals)

    @jax.jit
    def sort1key_u32(t, d, v):
        dq = (d * jnp.float32(104857.0)).astype(jnp.uint32) & 0xFFFFF
        key = (t.astype(jnp.uint32) << 20) | dq
        return jax.lax.sort((key, v), num_keys=1)

    timeit(f"packed u32 sort+val       n={Np}", sort1key_u32, tiles, depths,
           vals)

    @jax.jit
    def presort(d, v):
        return jax.lax.sort((d, v), num_keys=1)

    timeit(f"splat depth presort       n={V}", presort, depths[:V], vals[:V])

    @jax.jit
    def argsortV(d):
        return jnp.argsort(d)

    timeit(f"argsort                   n={V}", argsortV, depths[:V])

    # NN search at tracking geometry
    from gs_icp_slam_tpu.ops.knn import nn_search, knn_search
    Q, R = 8160, 1 << 16
    q = jnp.asarray(rng.uniform(-2, 2, (Q, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rv = jnp.ones((R,), bool)
    timeit(f"nn_search {Q}x{R}", nn_search, q, r, rv)
    qv = jnp.ones((Q,), bool)
    timeit(f"knn_search k=20 {Q}x{Q}", knn_search, q, q, qv)

    # scatter throughput (tile_list build)
    T, K = 3226, 256
    pos = jnp.asarray(rng.integers(0, T * K, Np).astype(np.int32))

    @jax.jit
    def scatter(v, p):
        return jnp.full((T * K,), V, jnp.int32).at[p].set(v, mode="drop")

    timeit(f"scatter {Np} -> {T*K}", scatter, vals, pos)

    # gather for composite attrs
    attr = jnp.asarray(rng.normal(size=(10, V + 1)).astype(np.float32))
    tl = jnp.asarray(rng.integers(0, V, (T, K)).astype(np.int32))

    @jax.jit
    def gather(a, t):
        return jnp.moveaxis(a[:, t], 0, 1)

    timeit(f"attr gather (10,{V})->({T},10,{K})", gather, attr, tl)


if __name__ == "__main__":
    main()
