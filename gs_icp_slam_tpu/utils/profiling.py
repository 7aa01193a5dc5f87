"""In-package profiling: congestion-immune op timing + roofline/MFU model.

The reference's only instrumentation is wall-clock FPS prints
(mp_Tracker.py:113,323,333); a TPU build needs to answer "is this kernel at
speed-of-light" (SURVEY §5).  Two tools:

  * slope_time: run an op R times inside ONE jit (lax.scan, salted against
    CSE) and difference against a single run — per-op cost free of the
    remote-dispatch round-trip, which on a tunneled chip can exceed the
    compute being measured by 100x.
  * roofline: FLOP/byte counts for the frame's dominant stages against the
    chip's peak compute and HBM bandwidth -> an attainable-time bound and
    the achieved fraction (MFU for compute-bound stages, bandwidth
    utilization for memory-bound ones).

Used by scripts/profile_stages.py and bench.py --profile.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def leaf_sum(x) -> jnp.ndarray:
    """Scalar f32 reduction over any pytree (forces full materialization)."""
    tot = jnp.float32(0)
    for leaf in jax.tree.leaves(x):
        if not hasattr(leaf, "dtype"):
            continue
        if leaf.dtype == bool:
            tot = tot + jnp.sum(leaf.astype(jnp.int32)).astype(jnp.float32)
        else:
            tot = tot + jnp.sum(leaf).astype(jnp.float32)
    return tot


def slope_time(make_salted, R: int = 8, reps: int = 3) -> float:
    """ms per op for `make_salted(salt)` (salt: tiny f32 scalar the body
    must fold into a float input so iterations cannot be CSE'd)."""
    def runner(n):
        @jax.jit
        def f():
            def step(acc, i):
                salt = acc * 1e-30 + i.astype(jnp.float32) * 1e-30
                return acc + leaf_sum(make_salted(salt)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.int32))
            return acc
        return f

    ts = {}
    for n in (1, R):
        f = runner(n)
        jax.device_get(f())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[R] - ts[1]) / (R - 1) * 1000.0


# ---------------------------------------------------------------------------
# roofline
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ChipSpec:
    name: str
    peak_flops_f32: float   # FLOP/s
    peak_flops_bf16: float
    hbm_gbps: float         # bytes/s / 1e9


# public numbers; the tunneled chip reports "TPU v5 lite" (v5e)
CHIPS = {
    "v5e": ChipSpec("TPU v5e", 98.3e12 / 2, 196.6e12, 819.0),
    "v4": ChipSpec("TPU v4", 137.5e12 / 2, 275.0e12, 1228.0),
    "cpu": ChipSpec("host CPU (nominal)", 1e12, 2e12, 100.0),
}


def detect_chip() -> ChipSpec:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5" in kind and "lite" in kind:
        return CHIPS["v5e"]
    if "v4" in kind:
        return CHIPS["v4"]
    if d.platform == "tpu":
        return CHIPS["v5e"]
    return CHIPS["cpu"]


@dataclass(frozen=True)
class StageModel:
    name: str
    flops: float   # useful FLOPs per invocation
    bytes: float   # unavoidable HBM traffic per invocation

    def attainable_ms(self, chip: ChipSpec, dtype: str = "f32") -> float:
        peak = (chip.peak_flops_bf16 if dtype == "bf16"
                else chip.peak_flops_f32)
        t_compute = self.flops / peak
        t_memory = self.bytes / (chip.hbm_gbps * 1e9)
        return max(t_compute, t_memory) * 1e3

    def utilization(self, measured_ms: float, chip: ChipSpec,
                    dtype: str = "f32") -> float:
        att = self.attainable_ms(chip, dtype)
        return att / measured_ms if measured_ms > 0 else 0.0


def raster_forward_model(n_cap: int, v_cap: int, tiles: int, tile_px: int,
                         tile_cap: int, pairs_real: int,
                         occupancy: int) -> StageModel:
    """FLOP/byte model of the tiled rasterizer forward at a given load.

    flops: projection (~150/splat) + compositing (~40 VPU ops per
    (pair, pixel) over REAL occupancy) — the sorts are counted as bytes
    (they are bandwidth-bound: ~log2(n)^2/2 bitonic passes over the key
    bytes, though XLA's TPU sort is typically several x off that bound).
    """
    P = tile_px * tile_px
    flops = 150.0 * n_cap + 40.0 * occupancy * P
    sort_passes = lambda n: max(n.bit_length(), 1) ** 2 / 2
    bytes_ = (
        4.0 * 16 * n_cap * 2                    # attr write + read
        + 8.0 * n_cap * sort_passes(n_cap)      # depth sort (2-op)
        + 4.0 * 9 * v_cap * sort_passes(9 * v_cap)  # pair sort (1-op)
        + 4.0 * 16 * tiles * tile_cap * 2       # tile attr gather out+in
        + 4.0 * 8 * tiles * P                   # composite output
    )
    return StageModel("raster_fwd", flops, bytes_)


def gicp_iteration_model(n_source: int, n_target: int) -> StageModel:
    """One GN iteration: 1-NN (3 FLOPs/dot * S*T via MXU) + component GN."""
    flops = 8.0 * n_source * n_target + 400.0 * n_source
    bytes_ = 4.0 * (3 * n_target + 9 * n_source * 4)
    return StageModel("gicp_iter", flops, bytes_)
