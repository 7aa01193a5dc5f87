"""Mid-run checkpoint / resume of the full SLAM state.

The reference has none (SURVEY §5: map-only save_ply at end of run;
capture()/restore() exist but are never called) — here the whole state is
one pytree of arrays, so checkpointing is a flat npz:

  map parameters + live/trackable masks + slot count
  Adam moments + step
  pose history
  keyframe store (poses + RGB-D) + counters

`save_checkpoint(engine, path)` / `load_checkpoint(engine, path)` operate
on a SLAMEngine in place so a run can resume exactly where it stopped.
"""
from __future__ import annotations

import numpy as np

from ..models import AdamState, GaussianMap


def save_fused_state(state, path: str) -> None:
    """Write a FusedEngine SLAMState (one device pytree) as npz."""
    arrays = {}
    for f in state.gmap._fields:
        arrays[f"gmap.{f}"] = np.asarray(getattr(state.gmap, f))
    for k, v in state.adam.m.items():
        arrays[f"adam.m.{k}"] = np.asarray(v)
    for k, v in state.adam.v.items():
        arrays[f"adam.v.{k}"] = np.asarray(v)
    arrays["adam.step"] = np.asarray(state.adam.step)
    for f in state.target._fields:
        arrays[f"target.{f}"] = np.asarray(getattr(state.target, f))
    for f in state._fields:
        if f in ("gmap", "adam", "target"):
            continue
        arrays[f"s.{f}"] = np.asarray(getattr(state, f))
    np.savez_compressed(path, **arrays)


def load_fused_state(path: str):
    import jax.numpy as jnp

    from ..ops.gicp import GICPTarget
    from ..slam.state import SLAMState

    z = np.load(path, allow_pickle=False)
    gmap = GaussianMap(**{f: jnp.asarray(z[f"gmap.{f}"])
                          for f in GaussianMap._fields})
    keys = [k[len("adam.m."):] for k in z.files if k.startswith("adam.m.")]
    adam = AdamState(
        m={k: jnp.asarray(z[f"adam.m.{k}"]) for k in keys},
        v={k: jnp.asarray(z[f"adam.v.{k}"]) for k in keys},
        step=jnp.asarray(z["adam.step"]))
    target = GICPTarget(**{f: jnp.asarray(z[f"target.{f}"])
                           for f in GICPTarget._fields})
    rest = {}
    for f in SLAMState._fields:
        if f in ("gmap", "adam", "target"):
            continue
        key = f"s.{f}"
        if key in z.files:
            rest[f] = jnp.asarray(z[key])
        else:  # field added after the checkpoint was written: zero default
            rest[f] = jnp.int32(0)
    # PRNG keys restore as uint32 arrays
    rest["rng"] = jnp.asarray(np.asarray(z["s.rng"], np.uint32))
    return SLAMState(gmap=gmap, adam=adam, target=target, **rest)


def save_checkpoint(engine, path: str) -> None:
    m = engine.gmap
    a = engine.adam
    arrays = {}
    for f in m._fields:
        arrays[f"map.{f}"] = np.asarray(getattr(m, f))
    for k, v in a.m.items():
        arrays[f"adam.m.{k}"] = np.asarray(v)
    for k, v in a.v.items():
        arrays[f"adam.v.{k}"] = np.asarray(v)
    arrays["adam.step"] = np.asarray(a.step)
    arrays["poses"] = np.stack(engine.poses) if engine.poses else np.zeros((0, 4, 4))
    arrays["kf.w2c"] = engine.kf_w2c[:engine.kf_count]
    arrays["kf.rgb"] = engine.kf_rgb[:engine.kf_count]
    arrays["kf.depth"] = engine.kf_depth[:engine.kf_count]
    arrays["kf.new"] = np.asarray(engine.new_keyframes, np.int64)
    arrays["counters"] = np.asarray(
        [engine.kf_count, engine.from_last_kf, engine.train_iter], np.int64)
    if engine.target is not None:
        arrays["target.points"] = np.asarray(engine.target.points)
        arrays["target.cov6"] = np.asarray(engine.target.cov6)
        arrays["target.valid"] = np.asarray(engine.target.valid)
        arrays["target.nn_bias"] = np.asarray(engine.target.nn_bias)
    # keyframe-choice RNG state, so resumed mapping iterations replay
    # exactly; PCG64 state/inc are 128-bit -> stored as (hi, lo) uint64
    st = engine.rng.bit_generator.state

    def split128(x):
        return np.asarray([x >> 64, x & ((1 << 64) - 1)], np.uint64)

    arrays["rng.state"] = split128(st["state"]["state"])
    arrays["rng.inc"] = split128(st["state"]["inc"])
    np.savez_compressed(path, **arrays)


def load_checkpoint(engine, path: str) -> None:
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    m_kw = {f: jnp.asarray(z[f"map.{f}"]) for f in GaussianMap._fields}
    engine.gmap = GaussianMap(**m_kw)
    keys = [k[len("adam.m."):] for k in z.files if k.startswith("adam.m.")]
    engine.adam = AdamState(
        m={k: jnp.asarray(z[f"adam.m.{k}"]) for k in keys},
        v={k: jnp.asarray(z[f"adam.v.{k}"]) for k in keys},
        step=jnp.asarray(z["adam.step"]))
    engine.poses = [p for p in z["poses"]]
    kf_count, from_last, train_iter = z["counters"].tolist()
    engine.kf_count = int(kf_count)
    engine.from_last_kf = int(from_last)
    engine.train_iter = int(train_iter)
    engine.kf_w2c[:engine.kf_count] = z["kf.w2c"]
    engine.kf_rgb[:engine.kf_count] = z["kf.rgb"]
    engine.kf_depth[:engine.kf_count] = z["kf.depth"]
    engine.new_keyframes = z["kf.new"].tolist()
    if "target.points" in z.files:
        from ..ops.gicp import GICPTarget

        engine.target = GICPTarget(points=jnp.asarray(z["target.points"]),
                                   cov6=jnp.asarray(z["target.cov6"]),
                                   valid=jnp.asarray(z["target.valid"]),
                                   nn_bias=jnp.asarray(z["target.nn_bias"]))
    if "rng.state" in z.files:
        def join128(a):
            return (int(a[0]) << 64) | int(a[1])

        st = engine.rng.bit_generator.state
        st["state"]["state"] = join128(z["rng.state"])
        st["state"]["inc"] = join128(z["rng.inc"])
        engine.rng.bit_generator.state = st
