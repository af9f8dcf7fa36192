"""Multi-host bring-up (SURVEY §2.5 comms backend row).

One process per host, `jax.distributed.initialize` forms the global
runtime; meshes from doa_tpu.parallel.mesh then span all hosts' devices —
XLA routes collectives over ICI within a slice and DCN across slices.
There is NO elasticity: a lost host fails the job (fail-fast is the
documented behavior — SURVEY §5 failure detection).

Per-host data feeding: each host owns the time-shards of its local
devices; `host_local_to_global` assembles a global array from per-host
blocks without gathering samples anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from doa_tpu.parallel.mesh import SNAP_AXIS, MeshSpec


@dataclasses.dataclass
class DistributedContext:
    num_hosts: int
    host_id: int
    mesh: Mesh

    @property
    def is_leader(self) -> bool:
        return self.host_id == 0


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               n_grid: int = 1) -> DistributedContext:
    """Initialize the multi-host runtime and build the global mesh.

    With no arguments, auto-detects (TPU pod metadata / env vars); single
    process works too (num_processes=1), so the same entry point runs from
    a laptop to a pod slice.
    """
    if num_processes is None or num_processes > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except (ValueError, RuntimeError):
            pass  # single-process / already initialized
    devices = jax.devices()
    spec = MeshSpec(n_snap=len(devices) // n_grid, n_grid=n_grid)
    from doa_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(spec, devices)
    return DistributedContext(
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
        mesh=mesh,
    )


def host_local_to_global(ctx: DistributedContext, x_local: np.ndarray,
                         pspec: P = P(SNAP_AXIS, None)):
    """Per-host sample block (T_local, N) → global sharded array
    (num_hosts*T_local, N) without any host gathering the whole capture:
    each host contributes its block to the addressable shards only."""
    sharding = NamedSharding(ctx.mesh, pspec)
    global_shape = (x_local.shape[0] * ctx.num_hosts,) + x_local.shape[1:]
    n_local_dev = len([
        d for d in ctx.mesh.devices.flat
        if d.process_index == ctx.host_id])
    per_dev = x_local.shape[0] // max(n_local_dev, 1)
    arrays = []
    local_devs = [d for d in ctx.mesh.devices.flat
                  if d.process_index == ctx.host_id]
    for i, d in enumerate(local_devs):
        arrays.append(jax.device_put(
            x_local[i * per_dev:(i + 1) * per_dev], d))
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, arrays)
