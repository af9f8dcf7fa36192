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
    hp = jax.lax.Precision.HIGHEST
    y = jnp.dot(vp_ref[0], at_ref[:], preferred_element_type=jnp.float32,
                precision=hp)
    y2 = y * y                                    # (BT·2K, GT)
    part = jnp.dot(s_ref[:], y2, preferred_element_type=jnp.float32,
                   precision=hp)
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


# ---------------------------------------------------------------------
# Fused scan + normalize + peak extraction (spectrum never leaves VMEM)
# ---------------------------------------------------------------------

_NEG = -1e30          # sentinel for "no peak" (avoids inf handling)
_PAD_NRM = 1e30       # nrm pad value: padded grid bins get den ≈ 1e30


def _scan_peaks_kernel(nrm_ref, vp_ref, at_ref, s_ref, out_ref, *,
                       G: int, k: int, x_min: float, dx: float,
                       refine: bool, out_w: int):
    """One program = BT windows × the FULL grid, entirely in VMEM.

    Normalization is free: Pn = P/max(P) = den_min/den, so the spectrum
    P itself is never formed. Peak rule matches ops.peaks.find_local_max
    exactly (interior bins, strict-left / ≥-right, first-index
    tie-break, best-peak padding, global-argmax fallback where the
    fallback value is exactly 1.0 — the normalized global max). The
    reciprocal-space parabolic refinement runs on the RAW denominator:
    delta = ½(qm−qp)/(qm−2q0+qp) is scale-invariant, so q = den gives
    the identical sub-bin offset without materializing 1/P."""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    y = jnp.dot(vp_ref[0], at_ref[:], preferred_element_type=f32,
                precision=hp)
    part = jnp.dot(s_ref[:], y * y, preferred_element_type=f32,
                   precision=hp)
    den = nrm_ref[:] - part                       # (BT, Gp)
    den = jnp.maximum(den, jnp.finfo(f32).tiny)
    dmin = jnp.min(den, axis=-1, keepdims=True)
    Pn = dmin / den                               # normalized spectrum
    iota = jax.lax.broadcasted_iota(jnp.int32, Pn.shape, 1)
    Gp = Pn.shape[-1]
    left = jnp.concatenate([Pn[:, :1], Pn[:, :-1]], axis=1)   # Pn[g−1]
    right = jnp.concatenate([Pn[:, 1:], Pn[:, -1:]], axis=1)  # Pn[g+1]
    interior = (iota >= 1) & (iota <= G - 2)
    masked = jnp.where(interior & (Pn > left) & (Pn >= right), Pn, _NEG)
    # global argmax of Pn = first index achieving den == dmin
    gidx = jnp.min(jnp.where(den == dmin, iota, Gp), axis=-1,
                   keepdims=True)
    vals_l, idx_l = [], []
    for _ in range(k):
        v = jnp.max(masked, axis=-1, keepdims=True)
        i = jnp.min(jnp.where(masked == v, iota, Gp), axis=-1,
                    keepdims=True)
        masked = jnp.where(iota == i, _NEG, masked)
        vals_l.append(v)
        idx_l.append(i)
    vals = jnp.concatenate(vals_l, axis=-1)       # (BT, k)
    idx = jnp.concatenate(idx_l, axis=-1)
    have_any = vals[:, :1] > 0.5 * _NEG
    best_val = jnp.where(have_any, vals[:, :1], 1.0)
    best_idx = jnp.where(have_any, idx[:, :1], gidx)
    valid = vals > 0.5 * _NEG
    vals = jnp.where(valid, vals, best_val)
    idx = jnp.where(valid, idx, best_idx)
    if refine:
        deltas = []
        for j in range(k):
            ij = idx[:, j:j + 1]
            pick = lambda off: jnp.sum(  # noqa: E731
                jnp.where(iota == ij + off, den, 0.0), axis=-1,
                keepdims=True)
            q0, qm, qp = pick(0), pick(-1), pick(1)
            dden = qm - 2.0 * q0 + qp
            d = jnp.where(jnp.abs(dden) > 0, 0.5 * (qm - qp) / dden, 0.0)
            d = jnp.clip(d, -0.5, 0.5)
            deltas.append(jnp.where((ij > 0) & (ij < G - 1), d, 0.0))
        frac = idx.astype(f32) + jnp.concatenate(deltas, axis=-1)
    else:
        frac = idx.astype(f32)
    locs = x_min + frac * dx
    BT = vals.shape[0]
    out_ref[:] = jnp.concatenate(
        [vals, locs, jnp.zeros((BT, out_w - 2 * k), f32)], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "k2", "k", "x_min", "x_max", "refine", "interpret"))
def music_scan_peaks_from_packed(Vp, k2: int, At_emb, k: int,
                                 x_min: float, x_max: float,
                                 refine: bool = True, nrm=None,
                                 interpret: bool = False):
    """Lane-packed subspace → (peak values, peak angles), each
    f32[nb·BT, k]. The (B, G) pseudospectrum lives only in VMEM —
    the HBM output is the (B, k) peak list (the production streaming
    shape; tracking consumes peaks, not spectra)."""
    nb, btk2, n2 = Vp.shape
    BT = btk2 // k2
    G = At_emb.shape[0]
    if k > 4:
        raise ValueError("fused peak kernel supports num_max_vals <= 4")
    if nrm is None:
        nrm = jnp.sum(At_emb * At_emb, axis=-1)
    Gp = ((G + 127) // 128) * 128
    if (btk2 + BT + 8) * Gp * 4 > 8 << 20:
        raise ValueError("grid too large for the fused peak kernel "
                         "(VMEM); use music_scan_from_packed + XLA peaks")
    At_T, _ = _pad_to(jnp.swapaxes(At_emb, 0, 1), Gp, 1)      # (2N, Gp)
    nrm_p = jnp.pad(nrm[None, :], ((0, 0), (0, Gp - G)),
                    constant_values=_PAD_NRM)
    S = np.zeros((BT, BT * k2), np.float32)
    for bt in range(BT):
        S[bt, bt * k2:(bt + 1) * k2] = 1.0
    S = jnp.asarray(S)

    out_w = 128
    dx = (x_max - x_min) / (G - 1)
    out = pl.pallas_call(
        functools.partial(_scan_peaks_kernel, G=G, k=k, x_min=x_min,
                          dx=dx, refine=refine, out_w=out_w),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, Gp), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),            # nrm
            pl.BlockSpec((1, BT * k2, n2), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),            # V packed
            pl.BlockSpec((n2, Gp), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),            # Atᵀ
            pl.BlockSpec((BT, BT * k2), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),            # S
        ],
        out_specs=pl.BlockSpec((BT, out_w), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BT, out_w), jnp.float32),
        interpret=interpret,
    )(nrm_p, Vp, At_T, S)
    return out[:, :k], out[:, k:2 * k]


def music_scan_peaks_pallas(V_emb, At_emb, k: int, x_min: float,
                            x_max: float, refine: bool = True,
                            block_b: int = 0, interpret: bool = False):
    """Batched-subspace entry for the fused scan+peaks kernel."""
    B, n2, k2 = V_emb.shape
    if block_b == 0:
        block_b = max(128 // k2, 1)
    Vp, B_orig = pack_subspace(V_emb, block_b)
    vals, locs = music_scan_peaks_from_packed(
        Vp, k2, At_emb, k, x_min, x_max, refine=refine,
        interpret=interpret)
    return vals[:B_orig], locs[:B_orig]
