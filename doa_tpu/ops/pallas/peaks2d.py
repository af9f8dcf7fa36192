"""Fused 2-D peak-extraction Pallas TPU kernel (reference
`find_local_max`, SURVEY §2.1 C6, az/el variant — BASELINE config 5).

`ops.peaks.find_local_max_2d` in XLA costs ~6.6–8.8 ms at the c5 shape
(B=2048, 181×91): the 4-neighbor mask, the flat relayout, k argmax+mask
rounds and the refinement gathers each re-cross the padded spectrum in
HBM. This kernel works on the row-major FLATTENED spectrum (one XLA
reshape feeds it) with 2-D adjacency expressed as ±1 (el) and ±Ge (az)
lane shifts, so every mask/reduce/select is batched over a
(BT, Gflat) block — full VPU width across windows, one HBM pass, and
the HBM output is the (B, 3k) peak list. (A first variant that
processed one window per unrolled 2-D tile was bit-exact but LOST to
XLA — 11.8 vs 8.8 ms: per-window serial reduces waste the VPU; this
lane-batched form is the same structure as the proven 1-D
music_scan._scan_peaks_kernel.)

Exact-parity contract with ops.peaks.find_local_max_2d (pinned by
tests/test_peaks2d_pallas.py):
  * peak rule: interior bins (both axes), strict > up/left,
    >= down/right;
  * top-k by value, first-flat-index (row-major) tie-break;
  * windows with < k peaks pad with the best peak; none → global
    argmax;
  * refine: separable 3-point parabola in RECIPROCAL space along the
    az column / el row through each peak, clipped to ±0.5 bins,
    interior peaks only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_BIG = 1 << 30


def _peaks2d_kernel(ri_ref, ci_ref, p_ref, out_ref, *, Ga: int,
                    Ge: int, G: int, k: int, az0: float, daz: float,
                    el0: float, de: float, refine: bool, out_w: int):
    f32 = jnp.float32
    P = p_ref[...]                                    # (BT, Gp) flat
    BT, Gp = P.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, P.shape, 1)
    # row/col of each flat bin as INPUT maps (no integer division in
    # the kernel — Mosaic int-div lowering is the risky op here)
    ri = jnp.broadcast_to(ri_ref[...], P.shape)
    ci = jnp.broadcast_to(ci_ref[...], P.shape)

    def shift(x, off):
        """result[:, g] = x[:, g+off] (edge-clamped; the interior mask
        excludes every bin whose neighbor would wrap a row)."""
        if off < 0:
            pad = jnp.broadcast_to(x[:, :1], (BT, -off))
            return jnp.concatenate([pad, x[:, :off]], axis=1)
        pad = jnp.broadcast_to(x[:, -1:], (BT, off))
        return jnp.concatenate([x[:, off:], pad], axis=1)

    up = shift(P, -Ge)        # P[r-1, c]
    dn = shift(P, Ge)         # P[r+1, c]
    lf = shift(P, -1)         # P[r, c-1]
    rt = shift(P, 1)          # P[r, c+1]
    interior = ((ri >= 1) & (ri <= Ga - 2) & (ci >= 1) & (ci <= Ge - 2)
                & (iota < G))
    core = interior & (P > up) & (P >= dn) & (P > lf) & (P >= rt)
    masked = jnp.where(core, P, _NEG)
    inb = iota < G

    vals_l, idx_l = [], []
    m_cur = masked
    for _ in range(k):
        v = jnp.max(m_cur, axis=-1, keepdims=True)            # (BT, 1)
        i = jnp.min(jnp.where(m_cur == v, iota, _BIG), axis=-1,
                    keepdims=True)
        m_cur = jnp.where(iota == i, _NEG, m_cur)
        vals_l.append(v)
        idx_l.append(i)

    # fewer-than-k / no-peak fill: none → global argmax over real bins
    Pg = jnp.where(inb, P, _NEG)
    gv = jnp.max(Pg, axis=-1, keepdims=True)
    gf = jnp.min(jnp.where(Pg == gv, iota, _BIG), axis=-1,
                 keepdims=True)
    valid = [v > 0.5 * _NEG for v in vals_l]
    best_v = jnp.where(valid[0], vals_l[0], gv)
    best_f = jnp.where(valid[0], idx_l[0], gf)
    vals_l = [jnp.where(ok, v, best_v) for ok, v in zip(valid, vals_l)]
    idx_l = [jnp.where(ok, f, best_f) for ok, f in zip(valid, idx_l)]

    tiny = jnp.finfo(f32).tiny
    azs, els = [], []
    for f in idx_l:
        sel = iota == f
        ra = jnp.sum(jnp.where(sel, ri, 0), axis=-1,
                     keepdims=True)                           # (BT, 1)
        ce = f - ra * Ge

        def pick(fi):
            return jnp.sum(jnp.where(iota == fi, P, 0.0), axis=-1,
                           keepdims=True)

        if refine:
            q = lambda v: 1.0 / jnp.maximum(v, tiny)      # noqa: E731
            q0 = q(pick(f))
            # az (row) axis parabola through (ra±1, ce) = f ∓ Ge
            qm = q(pick(jnp.maximum(f - Ge, ce)))
            qp = q(pick(jnp.minimum(f + Ge, (Ga - 1) * Ge + ce)))
            dd = qm - 2.0 * q0 + qp
            da_ = jnp.where(jnp.abs(dd) > 0, 0.5 * (qm - qp) / dd, 0.0)
            da_ = jnp.clip(da_, -0.5, 0.5)
            da_ = jnp.where((ra > 0) & (ra < Ga - 1), da_, 0.0)
            # el (col) axis parabola through (ra, ce±1) = f ∓ 1
            qm = q(pick(jnp.maximum(f - 1, ra * Ge)))
            qp = q(pick(jnp.minimum(f + 1, ra * Ge + Ge - 1)))
            dd = qm - 2.0 * q0 + qp
            de_ = jnp.where(jnp.abs(dd) > 0, 0.5 * (qm - qp) / dd, 0.0)
            de_ = jnp.clip(de_, -0.5, 0.5)
            de_ = jnp.where((ce > 0) & (ce < Ge - 1), de_, 0.0)
            fa = ra.astype(f32) + da_
            fe = ce.astype(f32) + de_
        else:
            fa = ra.astype(f32)
            fe = ce.astype(f32)
        azs.append(az0 + fa * daz)
        els.append(el0 + fe * de)

    out_ref[...] = jnp.concatenate(
        vals_l + azs + els
        + [jnp.zeros((BT, out_w - 3 * k), f32)], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "k", "az_rng", "el_rng", "refine", "block_b", "interpret"))
def find_local_max_2d_pallas(P, k: int, az_rng, el_rng,
                             refine: bool = False, block_b: int = 8,
                             interpret: bool = False):
    """P: f32[B, Ga, Ge] → (values, az, el) each f32[B, k]; exact
    parity with ops.peaks.find_local_max_2d (k ≤ 4).

    Contract: P must be a POSITIVE pseudospectrum (as with
    find_local_max's refine mode — the reciprocal-space refinement
    assumes it, and the kernel's finite no-peak sentinel (−1e30, vs
    XLA's −inf) additionally means parity is only guaranteed for
    spectra with values > −5e29; every pseudospectrum satisfies both).

    block_b = windows per program (sublane-aligned; hardware sweep at
    the c5 shape: 8 → 5.64 ms, 16 → 5.73, 32 → 5.46, 64 → Mosaic
    compile failure — flat within ~3%, so the default stays at the
    safe 8)."""
    if k > 4:
        raise ValueError("fused 2-D peak kernel supports k <= 4")
    B, Ga, Ge = P.shape
    G = Ga * Ge
    out_w = 128
    BT = block_b
    Gp = ((G + 127) // 128) * 128
    Bp = ((B + BT - 1) // BT) * BT
    Pf = P.reshape(B, G)
    Pf = jnp.pad(Pf, ((0, Bp - B), (0, Gp - G)))
    gidx = jnp.arange(Gp, dtype=jnp.int32)
    ri_map = (gidx // Ge)[None, :]                    # (1, Gp) int32
    ci_map = (gidx % Ge)[None, :]
    daz = (az_rng[1] - az_rng[0]) / (Ga - 1)
    de = (el_rng[1] - el_rng[0]) / (Ge - 1)
    out = pl.pallas_call(
        functools.partial(
            _peaks2d_kernel, Ga=Ga, Ge=Ge, G=G, k=k,
            az0=float(az_rng[0]), daz=float(daz),
            el0=float(el_rng[0]), de=float(de),
            refine=refine, out_w=out_w),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((1, Gp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, Gp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, out_w), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_w), jnp.float32),
        interpret=interpret,
    )(ri_map, ci_map, Pf)
    return out[:B, :k], out[:B, k:2 * k], out[:B, 2 * k:3 * k]
