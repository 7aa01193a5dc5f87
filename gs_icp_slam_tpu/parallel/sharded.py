"""Sharding layout for the fused SLAM state over a device mesh.

The multi-chip design (SURVEY §5 "map-scaling axis", §7 step 7): the
Gaussian map parameters and Adam moments are sharded along the capacity
axis (FSDP), everything frame-sized or scalar is replicated, and the
mapping optimization inside the fused step runs as a `shard_map` region —
all-gather the parameter shards, each device renders a DIFFERENT keyframe,
psum-scatter the gradients back to shards, shard-local masked Adam.  One
sharded mapping iteration therefore performs `n_devices` reference-mapper
iterations (mp_Mapper.py:196-248) of work per step.

Tracking (G-ICP), keyframe insertion, pruning and target export run under
GSPMD on the same jitted program: their inputs are replicated or
elementwise-sharded, so XLA inserts the few needed collectives
automatically.  Used by `make_fused_step(cfg, filt, mesh=...)` and by
`FusedEngine(..., mesh=...)`; tested on the 8-virtual-device CPU mesh in
tests/test_parallel.py.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import AdamState, GaussianMap
from ..ops.gicp import GICPTarget

MAP_AXIS = "map"

_PARAM_FIELDS = ("xyz", "f_dc", "f_rest", "log_scaling", "rotation",
                 "opacity_logit")

# "auto" mode keeps the map replicated (DP) until params + both Adam
# moments exceed this per-device budget; beyond it the map genuinely
# doesn't fit and capacity-sharding (FSDP) pays for itself.  ~170 B/splat
# at sh_degree 0 -> the threshold flips around 6M splats (v5e has 16 GB).
DP_MAX_BYTES = 1 << 30


def _map_bytes(capacity: int, sh_degree: int) -> int:
    coeffs = (sh_degree + 1) ** 2
    per = (3 + 3 + 3 * max(coeffs - 1, 0) + 3 + 4 + 1) * 4
    return capacity * per * 3  # params + Adam m + Adam v


def choose_mode(capacity: int, sh_degree: int = 0,
                requested: str = "auto") -> str:
    """Resolve cfg.engine.parallel_mode: 'dp' | 'fsdp'."""
    if requested in ("dp", "fsdp"):
        return requested
    return "dp" if _map_bytes(capacity, sh_degree) <= DP_MAX_BYTES \
        else "fsdp"


def state_shardings(mesh: Mesh, axis: str = MAP_AXIS,
                    mode: str = "fsdp"):
    """A SLAMState-shaped pytree of NamedShardings for `mesh`.

    fsdp: map parameters, Adam moments and per-slot masks shard along
    capacity; dp: they replicate (each device holds the whole map and
    the mapping step shards KEYFRAMES instead).  The G-ICP target,
    keyframe store, pose history and every scalar are always replicated
    (they are small and read by every device).
    """
    from ..slam.state import SLAMState

    shard = NamedSharding(mesh, P(axis) if mode == "fsdp" else P())
    repl = NamedSharding(mesh, P())

    gmap_sh = GaussianMap(
        xyz=shard, f_dc=shard, f_rest=shard, log_scaling=shard,
        rotation=shard, opacity_logit=shard, trackable=shard, live=shard,
        n=repl)
    param_sh = {k: shard for k in _PARAM_FIELDS}
    adam_sh = AdamState(m=dict(param_sh), v=dict(param_sh), step=repl)
    target_sh = GICPTarget(**{f: repl for f in GICPTarget._fields})
    rest = {f: repl for f in SLAMState._fields
            if f not in ("gmap", "adam", "target")}
    return SLAMState(gmap=gmap_sh, adam=adam_sh, target=target_sh, **rest)


def place_state(state, mesh: Mesh, axis: str = MAP_AXIS,
                mode: str = "fsdp"):
    """Device_put a host-initialized SLAMState onto the mesh layout."""
    return jax.device_put(state, state_shardings(mesh, axis, mode))
