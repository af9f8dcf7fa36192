"""Pallas ICI ring halo exchange (SURVEY §2.5 "ring" row; SNIPPETS
patterns [1][2] — right-permute via `make_async_remote_copy`).

The sharded pipeline's overlap halo is an `lax.ppermute` under shard_map
(the `impl="xla"` branch below) — XLA schedules that collective as its
own phase. This kernel is the fused alternative: each device DMAs its
local block into the output AND async-remote-copies its head `overlap`
rows straight into the LEFT neighbor's halo slot over the ICI, so the
halo transfer can overlap the local copy (and, when fused into a larger
kernel, local compute). The ring wraps (device 0 → device n−1); the last
shard's halo feeds only its tail windows, which are invalid by
construction (parallel.sharded.num_valid_windows), matching the zero-fill
semantics of the non-wrapping ppermute.

HARDWARE SCOPE (honest): executing this requires ≥2 TPU devices on real
ICI. This container exposes one chip, and Pallas remote DMAs have no CPU
interpreter, so CI covers structure only (shapes/wiring via eval_shape;
tests/test_ring_pallas.py) and a TPU-slice test is included but skipped
off-hardware. The ppermute path remains the tested default; switch with
`DoaConfig(halo_impl="pallas")` — `build_sharded_pipeline` dispatches
through `halo_exchange` below, and the driver dryrun builds (traces) the
pallas variant on every run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(x_ref, out_ref, local_sem, send_sem, recv_sem, *,
                 overlap: int, axis_name: str):
    my = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    left = jax.lax.rem(my + n - 1, n)
    T_loc = x_ref.shape[0]

    local = pltpu.make_async_copy(
        x_ref.at[:], out_ref.at[:T_loc], local_sem)
    local.start()

    remote = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:overlap],
        dst_ref=out_ref.at[T_loc:],          # halo slot on the LEFT peer
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=(left,),
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    remote.start()
    local.wait()
    remote.wait()                             # our halo has arrived


def halo_exchange_pallas(plane, overlap: int, axis_name: str):
    """Per-shard (T_loc, N) plane → (T_loc + overlap, N) with the right
    neighbor's head rows appended, as ONE fused Pallas program (local
    DMA + async remote copy over ICI). Call inside shard_map on the
    time axis; `build_sharded_pipeline` selects it via
    `DoaConfig(halo_impl="pallas")` on pods."""
    T_loc, N = plane.shape
    return pl.pallas_call(
        functools.partial(_halo_kernel, overlap=overlap,
                          axis_name=axis_name),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T_loc + overlap, N),
                                       plane.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 3,
        compiler_params=pltpu.CompilerParams(
            collective_id=0),
    )(plane)


def halo_exchange(plane, overlap: int, axis_name: str,
                  impl: str = "xla"):
    """Overlap halo exchange: impl="xla" → lax.ppermute (the tested
    default; zero-fills the last shard), impl="pallas" → the fused ICI
    remote-copy kernel above (pod hardware)."""
    n = jax.lax.axis_size(axis_name)
    if overlap == 0 or n == 1:
        return plane
    if impl == "pallas":
        return halo_exchange_pallas(plane, overlap, axis_name)
    head = plane[:overlap]
    perm = [(i + 1, i) for i in range(n - 1)]
    halo = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([plane, halo], axis=0)
