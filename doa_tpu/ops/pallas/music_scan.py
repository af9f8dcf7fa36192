"""Fused MUSIC subspace-scan Pallas TPU kernel.

Computes the pseudospectrum P[b, g] = 1 / (‖a_g‖² − ‖V_bᵀ ã_g‖²) for a
batch of embedded signal subspaces V: f32[B, 2N, 2K] against an embedded
steering grid Ã: f32[G, 2N] — the production MUSIC scan (power-iteration
subspace path), with the reciprocal fused so the raw denominator never
round-trips HBM.

MXU-shaping: the per-snapshot output width 2K (4..8) is far below the
128-lane tile, so BT snapshots are PACKED into the lane axis:

    V_packed: (B/BT, BT·2K, 2N)   — lanes carry BT·2K = 128
    Y   = V_chunk · ÃᵀT_tile      — (BT·2K, 2N)·(2N, GT) on the MXU
    den = nrm − Sᵀ·(Y∘Y)          — S: static 0/1 (BT·2K → BT) reducer,
                                     a second MXU matmul, no tiny-axis
                                     VPU reductions
    out tile: P (BT, GT)

Both matmuls are 128×128-class ops; the elementwise square and the
reciprocal ride the VPU between them. Grid: (B/BT, G/GT).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x, mult, axis):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), size


def pack_subspace(V_emb, block_b: int):
    """V: (B, 2N, 2K) → (ceil(B/BT), BT·2K, 2N) lane-packed layout.

    Pads B up to a BT multiple (padded rows produce den = nrm − 0 > 0,
    harmless; the wrapper slices them off)."""
    V_emb, B = _pad_to(V_emb, block_b, 0)
    Bp, n2, k2 = V_emb.shape
    Vp = V_emb.reshape(Bp // block_b, block_b, n2, k2)
    Vp = jnp.swapaxes(Vp, 2, 3)                   # (nb, BT, 2K, 2N)
    return Vp.reshape(Bp // block_b, block_b * k2, n2), B


def _scan_kernel(nrm_ref, vp_ref, at_ref, s_ref, out_ref):
    y = jnp.dot(vp_ref[0], at_ref[:], preferred_element_type=jnp.float32)
    y2 = y * y                                    # (BT·2K, GT)
    part = jnp.dot(s_ref[:], y2, preferred_element_type=jnp.float32)
    den = nrm_ref[:] - part                       # (BT, GT) via broadcast
    den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
    out_ref[:] = 1.0 / den


@functools.partial(jax.jit,
                   static_argnames=("block_b", "block_g", "interpret"))
def music_scan_pallas(V_emb, At_emb, nrm=None, *, block_b: int = 0,
                      block_g: int = 128, interpret: bool = False):
    """V_emb: f32[B, 2N, 2K]; At_emb: f32[G, 2N] (embedded steering,
    [ar; ai] per row); nrm: f32[G] = ‖a_g‖² (computed if None) →
    P: f32[B, G] (unnormalized reciprocal pseudospectrum)."""
    B, n2, k2 = V_emb.shape
    if block_b == 0:
        block_b = max(128 // k2, 1)
    Vp, B_orig = pack_subspace(V_emb, block_b)
    return music_scan_from_packed(
        Vp, k2, At_emb, nrm, block_g=block_g,
        interpret=interpret)[:B_orig]


@functools.partial(jax.jit,
                   static_argnames=("k2", "block_g", "interpret"))
def music_scan_from_packed(Vp, k2: int, At_emb, nrm=None, *,
                           block_g: int = 128, interpret: bool = False):
    """Lane-packed entry: Vp f32[nb, BT·2K, 2N] (rows = (window, k) —
    exactly ops.pallas.subspace.subspace_packed_pallas's output reshaped)
    → P f32[nb·BT, G]. Skips the XLA repacking relayout entirely when
    fed from the fused subspace kernel."""
    nb, btk2, n2 = Vp.shape
    BT = btk2 // k2
    G = At_emb.shape[0]
    if nrm is None:
        nrm = jnp.sum(At_emb * At_emb, axis=-1)
    GT = min(block_g, ((G + 127) // 128) * 128)

    At_T, _ = _pad_to(jnp.swapaxes(At_emb, 0, 1), GT, 1)  # (2N, Gp)
    nrm_p, _ = _pad_to(nrm[None, :], GT, 1)               # (1, Gp)
    ng = At_T.shape[1] // GT

    # Static 0/1 reducer: S[bt, bt*2K + k] = 1.
    S = np.zeros((BT, BT * k2), np.float32)
    for bt in range(BT):
        S[bt, bt * k2:(bt + 1) * k2] = 1.0
    S = jnp.asarray(S)

    out = pl.pallas_call(
        _scan_kernel,
        grid=(nb, ng),
        in_specs=[
            pl.BlockSpec((1, GT), lambda bi, gi: (0, gi),
                         memory_space=pltpu.VMEM),           # nrm
            pl.BlockSpec((1, BT * k2, n2), lambda bi, gi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),           # V packed
            pl.BlockSpec((n2, GT), lambda bi, gi: (0, gi),
                         memory_space=pltpu.VMEM),           # Atᵀ
            pl.BlockSpec((BT, BT * k2), lambda bi, gi: (0, 0),
                         memory_space=pltpu.VMEM),           # S
        ],
        out_specs=pl.BlockSpec((BT, GT), lambda bi, gi: (bi, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BT, ng * GT), jnp.float32),
        interpret=interpret,
    )(nrm_p, Vp, At_T, S)
    return out[:, :G]
