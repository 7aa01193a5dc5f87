"""Micro-bench: TPU gather/scatter orientation costs at rasterizer sizes."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _checksum(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves[:1])


def timeit(name, fn, *args, n=20, **kw):
    float(jax.device_get(_checksum(fn(*args, **kw))))
    t0 = time.time()
    acc = []
    for _ in range(n):
        acc.append(_checksum(fn(*args, **kw)))
    float(jax.device_get(sum(acc)))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:52s} {dt:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    N, V = 1 << 18, 1 << 16
    Np = V * 9

    x_row = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    x_col = jnp.asarray(np.ascontiguousarray(np.asarray(x_row).T))
    x_flat = x_row[:, 0]
    idx = jnp.asarray(rng.integers(0, N, V).astype(np.int32))

    timeit(f"row gather ({N},3)[{V}]", jax.jit(lambda x, i: x[i]), x_row, idx)
    timeit(f"lane gather (3,{N})[:,{V}]",
           jax.jit(lambda x, i: x[:, i]), x_col, idx)
    timeit(f"1d gather ({N},)[{V}]", jax.jit(lambda x, i: x[i]), x_flat, idx)

    x16 = jnp.asarray(rng.normal(size=(16, N)).astype(np.float32))
    idxp = jnp.asarray(rng.integers(0, N, Np).astype(np.int32))
    timeit(f"lane gather (16,{N})[:,{Np}]",
           jax.jit(lambda x, i: x[:, i]), x16, idxp)
    x16r = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    timeit(f"row gather ({N},16)[{Np}]",
           jax.jit(lambda x, i: x[i]), x16r, idxp)

    # one fused gather of all 6 compaction arrays as a (10, N) matrix
    x10 = jnp.asarray(rng.normal(size=(10, N)).astype(np.float32))
    timeit(f"lane gather (10,{N})[:,{V}]",
           jax.jit(lambda x, i: x[:, i]), x10, idx)

    # scatter orientations for used_v
    val = jnp.asarray(rng.integers(0, V, Np).astype(np.int32))

    @jax.jit
    def scat_bool(v):
        return jnp.zeros((V + 1,), bool).at[v].set(True, mode="drop")

    timeit(f"bool scatter {Np} -> {V}", scat_bool, val)

    # segment-max alternative over sorted pairs
    @jax.jit
    def seg(v):
        return jax.ops.segment_max(jnp.ones_like(v), v, num_segments=V + 1,
                                   indices_are_sorted=False)

    timeit(f"segment_max {Np} -> {V}", seg, val)


if __name__ == "__main__":
    main()
