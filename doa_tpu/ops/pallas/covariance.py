"""Pallas TPU kernel: overlapped-window stacked-Gram covariance.

One program per window b: DMA the (S, 2N) slice of the stacked planes
Z = [Xr | Xi] starting at the hop-strided offset b·hop (BlockSpec index
maps can only express block-multiple offsets, so the slice is fetched with
an explicit async copy), then a single MXU Gram ZᵀZ → the (2N, 2N) block
G_b written straight to the output — chunk partial sums never exist in
HBM, and the complex planes fall out of G's quadrants on the XLA side
(see cpx_ops.chunk_grams_cpx for the block identity).

For overlap ≤ S/2 this re-reads at most 2× the stream — still far under
HBM bandwidth for this op's arithmetic intensity (S multiply-adds per
loaded element).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doa_tpu.cpx import Cpx


def _cov_kernel(z_hbm, out_ref, scratch, sem, *, snap: int, hop: int):
    b = pl.program_id(0)
    dma = pltpu.make_async_copy(
        z_hbm.at[pl.ds(b * hop, snap), :], scratch, sem)
    dma.start()
    dma.wait()
    z = scratch[:]
    out_ref[0] = jax.lax.dot_general(
        z, z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("snapshot_size", "overlap", "interpret"))
def cov_windows_pallas(x: Cpx, snapshot_size: int, overlap: int,
                       interpret: bool = False) -> Cpx:
    """x: Cpx[T, N] → R: Cpx[B, N, N] (normalized by S), windows at every
    hop = S − overlap offset — reference autocorrelate semantics."""
    S = snapshot_size
    hop = S - overlap
    T, N = x.shape
    B = 0 if T < S else (T - S) // hop + 1
    Z = jnp.concatenate([x.re, x.im], axis=-1)         # (T, 2N)

    G = pl.pallas_call(
        functools.partial(_cov_kernel, snap=S, hop=hop),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # stays in HBM
        out_specs=pl.BlockSpec((1, 2 * N, 2 * N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * N, 2 * N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, 2 * N), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Z)
    G = G / S
    return Cpx(G[:, :N, :N] + G[:, N:, N:], G[:, N:, :N] - G[:, :N, N:])