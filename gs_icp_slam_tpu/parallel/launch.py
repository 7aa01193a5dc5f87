"""Multi-host launch: the distributed-backend entry point the reference
never had (SURVEY §5 "Distributed communication backend: none").

On a TPU pod slice every host runs the SAME program; `init_distributed()`
wires the JAX distributed runtime (DCN rendezvous), after which
`jax.devices()` spans the whole slice and the mesh built by
`global_mesh()` carries ICI+DCN collectives automatically.  The fused
engine then works unchanged: `FusedEngine(seq, cfg, mesh=global_mesh())`
— every host must feed the SAME frame stream (the dataset is read
per-host; RGB-D frames are tiny next to the map).

Not executable in this environment (one tunneled chip, no pod); covered
structurally by tests/test_parallel.py on the virtual CPU mesh and kept
as the single place pod bring-up will touch.
"""
from __future__ import annotations

import jax

from .sharded import MAP_AXIS
from .mapping import make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime.

    With no arguments, relies on the TPU environment variables the runtime
    sets on Cloud TPU / GKE (the common case); arguments override for
    manual bring-up.  Safe to call once per process, before any other JAX
    call.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = MAP_AXIS):
    """1-D mesh over every device in the (possibly multi-host) job."""
    return make_mesh(jax.devices(), axis=axis)
