"""Pallas TPU kernels: stacked-Gram covariance from raw sample planes.

Two kernels:

* `chunk_grams_pallas` — the PRODUCTION path (hop-aligned windows, i.e.
  hop | snapshot_size). Grid over chunk groups with plain BlockSpecs, so
  Mosaic double-buffers the HBM→VMEM streams automatically; the re/im
  planes are read ONCE and stacked Z = [Xr | Xi] in VMEM. The XLA
  equivalent (cpx_ops.chunk_grams_cpx) must materialize the stacked copy
  in HBM first: one extra full write + read of the stream (measured
  13.4 ms → the whole covariance budget at the headline config).
  Optional bf16 Gram (f32 accumulation): 4× MXU rate — the Gram's 32-wide
  output tiles run at ~6% MXU utilization in f32, so the stage is
  MXU-pass-bound, not bandwidth-bound, and bf16 quarters the pass count.

* `cov_windows_pallas` — irregular overlap (any 0 ≤ overlap < S): one
  program per window with an explicit hop-strided async copy (BlockSpec
  index maps can only express block-multiple offsets). Re-reads ≤ S/hop×
  the stream; used only when hop does not divide snapshot_size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doa_tpu.cpx import Cpx


def _chunk_kernel(xr_ref, xi_ref, rr_ref, ri_ref, *, hop: int, cb: int,
                  compute_dtype):
    N = xr_ref.shape[-1]
    for c in range(cb):                       # static unroll: cb chunks
        sl = slice(c * hop, (c + 1) * hop)
        z = jnp.concatenate([xr_ref[sl, :], xi_ref[sl, :]], axis=-1)
        if compute_dtype != jnp.float32:
            z = z.astype(compute_dtype)
        g = jax.lax.dot_general(
            z, z, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if compute_dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT))
        rr_ref[c] = g[:N, :N] + g[N:, N:]
        ri_ref[c] = g[N:, :N] - g[:N, N:]


@functools.partial(
    jax.jit, static_argnames=("hop", "compute_dtype", "chunks_per_block",
                              "interpret"))
def chunk_grams_pallas(x: Cpx, hop: int, compute_dtype=jnp.float32,
                       chunks_per_block: int = 8,
                       interpret: bool = False) -> Cpx:
    """x: Cpx[T, N] → unnormalized per-chunk Grams Cpx[T//hop, N, N].

    Drop-in for cpx_ops.chunk_grams_cpx (cumsum window combination and
    normalization happen in XLA on the N²-sized results)."""
    T, N = x.shape
    n = T // hop
    cb = chunks_per_block
    while n % cb:
        cb //= 2
    cb = max(cb, 1)

    rr, ri = pl.pallas_call(
        functools.partial(_chunk_kernel, hop=hop, cb=cb,
                          compute_dtype=compute_dtype),
        grid=(n // cb,),
        in_specs=[
            pl.BlockSpec((cb * hop, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb * hop, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cb, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, N, N), jnp.float32),
            jax.ShapeDtypeStruct((n, N, N), jnp.float32),
        ],
        interpret=interpret,
    )(x.re[: n * hop], x.im[: n * hop])
    return Cpx(rr, ri)


def _cov_kernel(z_hbm, out_ref, scratch, sem, *, snap: int, hop: int):
    b = pl.program_id(0)
    dma = pltpu.make_async_copy(
        z_hbm.at[pl.ds(b * hop, snap), :], scratch, sem)
    dma.start()
    dma.wait()
    z = scratch[:]
    out_ref[0] = jax.lax.dot_general(
        z, z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit,
                   static_argnames=("snapshot_size", "overlap", "interpret"))
def cov_windows_pallas(x: Cpx, snapshot_size: int, overlap: int,
                       interpret: bool = False) -> Cpx:
    """x: Cpx[T, N] → R: Cpx[B, N, N] (normalized by S), windows at every
    hop = S − overlap offset — reference autocorrelate semantics.

    gcd(S, hop) ≥ 64 → pipelined chunk-Gram kernel + strided sliding
    window sums (the production path; exact for ANY overlap); smaller
    gcds → the strided manual-DMA kernel below (re-reads ≤ S/hop× but
    keeps full-size Grams)."""
    import math

    S = snapshot_size
    hop = S - overlap
    T, N = x.shape
    B = 0 if T < S else (T - S) // hop + 1
    g = math.gcd(S, hop)
    if g >= 64:
        C = chunk_grams_pallas(x, g, interpret=interpret)
        n_win = S // g
        stride = hop // g

        def win(plane):
            csum = jnp.concatenate(
                [jnp.zeros((1, N, N), plane.dtype),
                 jnp.cumsum(plane, axis=0)], axis=0)
            lo = csum[0:(B - 1) * stride + 1:stride]
            hi = csum[n_win:n_win + (B - 1) * stride + 1:stride]
            return (hi - lo) / S

        return Cpx(win(C.re), win(C.im))
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