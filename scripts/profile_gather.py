"""Microbenchmark TPU gather/sort formulations for the raster pipeline.

Timing method: each op runs R times INSIDE one jit (lax.scan with a data
dependency through an accumulator), synced once by device_get; per-op cost
= (t(R) - t(1)) / (R - 1).  This cancels both the remote-dispatch
round-trip (~5 ms on the axon relay) and any backend congestion, which
made naive per-call timings useless.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(make_body, *args, R=16, reps=3):
    """make_body(*args, salt) -> scalar; salt breaks CSE across iters."""
    def runner(n):
        @jax.jit
        def f(*a):
            def step(acc, i):
                # i (i32) salts the body so iterations can't be CSE'd;
                # acc threads a data dependency between them
                salt = i + (acc * 0).astype(jnp.int32)
                return acc + make_body(*a, salt), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.int32))
            return acc
        return f

    ts = {}
    for n in (1, R):
        f = runner(n)
        s = f(*args)
        jax.device_get(s)  # compile+warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[R] - ts[1]) / (R - 1) * 1000  # ms per op


def main():
    rng = np.random.default_rng(0)
    N = 1 << 18
    V = 1 << 16
    T, K = 3225, 256
    R = 16

    table = jnp.asarray(rng.normal(size=(R, N + 1)).astype(np.float32))
    vis_order = jnp.asarray(rng.integers(0, N, V + 1).astype(np.int32))
    tile_list = jnp.asarray(rng.integers(0, V + 1, (T, K)).astype(np.int32))
    key_s = jnp.asarray(np.sort(rng.integers(0, 2 ** 30, 9 * V))
                        .astype(np.int32))
    gpos = jnp.asarray(rng.integers(0, 9 * V, (T, K)).astype(np.int32))
    full_list = jnp.asarray(rng.integers(0, N + 1, (T, K)).astype(np.int32))

    def run(name, body, *args):
        print(f"{name:38s} {bench(body, *args):8.3f} ms", flush=True)

    run("sum 16MB (bandwidth floor)",
        lambda t, s: jnp.sum(t * (1.0 + 1e-9 * s)), table)
    run("1D-table i32 gather (T,K) from 64k",
        lambda vo, tl, s: jnp.sum((vo[tl + s * 0]).astype(jnp.float32)),
        vis_order, tile_list)
    run("1D-table i32 gather (T,K) from 589k",
        lambda k, g, s: jnp.sum((k[g + s * 0]).astype(jnp.float32)),
        key_s, gpos)
    run("attr lane gather (16,T,K)",
        lambda t, fl, s: jnp.sum(t[:, fl + s * 0]), table, full_list)
    run("attr lane gather + swapaxes",
        lambda t, fl, s: jnp.sum(
            jnp.swapaxes(t[:, fl + s * 0], 0, 1) * 1.0000001),
        table, full_list)
    run("composed 2-level gather + swap",
        lambda t, vo, tl, s: jnp.sum(
            jnp.swapaxes(t[:, vo[tl + s * 0]], 0, 1) * 1.0000001),
        table, vis_order, tile_list)

    qs = (jnp.arange(T + 1, dtype=jnp.int32) << 17)
    run("searchsorted scan_unrolled 3226q",
        lambda k, q, s: jnp.sum(jnp.searchsorted(
            k, q + s * 0, method="scan_unrolled").astype(jnp.float32)),
        key_s, qs)

    keys = jnp.asarray(rng.integers(0, 2 ** 30, 9 * V).astype(np.int32))
    run("sort 589k 1-op i32",
        lambda k, s: jnp.sum(jax.lax.sort(k + s * 0).astype(jnp.float32)),
        keys)
    depth = jnp.asarray(rng.normal(size=N).astype(np.float32))
    iota = jnp.arange(N, dtype=jnp.int32)
    run("sort 256k 2-op f32+i32",
        lambda d, i, s: jnp.sum(jax.lax.sort(
            (d + s * 0.0, i), num_keys=1)[1].astype(jnp.float32)),
        depth, iota)
    # smaller-N variants (capacity bucketing payoff)
    run("sort 64k 2-op f32+i32",
        lambda d, i, s: jnp.sum(jax.lax.sort(
            (d[:65536] + s * 0.0, i[:65536]), num_keys=1)[1]
            .astype(jnp.float32)),
        depth, iota)
    run("sort 147k 1-op i32 (pairs @ V=16k)",
        lambda k, s: jnp.sum(jax.lax.sort(k[:147456] + s * 0)
                             .astype(jnp.float32)),
        keys)

    # scatter-add (gather backward)
    g = jnp.asarray(rng.normal(size=(R, T * K)).astype(np.float32))
    flat = full_list.reshape(-1)
    run("scatter-add back (16, N)",
        lambda gr, i, s: jnp.sum(jnp.zeros((R, N + 1), jnp.float32)
                                 .at[:, i + s * 0].add(gr)),
        g, flat)


if __name__ == "__main__":
    main()
