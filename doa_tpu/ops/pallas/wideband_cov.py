"""Wideband fast path: interleaved channelizer + multi-subband Pallas
covariance kernel (the c5 flagship's hot front-end).

The XLA reference path (ops.wideband.subband_covariances) channelizes
with a split-complex einsum "ft,mtn->fmn" and vmaps a per-subband
stacked-Gram covariance — measured 30.7 + 33 ms standalone at the c5
production shape (both layout-bound, docs/PERF.md "c5 anatomy"). This
module replaces the pair with:

1. **Channelize as ONE dense matmul in the interleaved layout.** The
   raw interleaved capture f32[T/tp, 2N·tp] reshaped to frames
   f32[M, F·2N] (a free, C-order reshape: rows = consecutive complex
   sample vectors) right-multiplied by a constant channelizer matrix
   K[t·2N+a, f·2N+b] = Wr[f,t]·δ_ab + Wi[f,t]·Sw[a,b] (Sw = per-pair
   [[0,1],[-1,0]] — the interleaved "multiply by j" swap) yields the
   channelized stream Y: f32[M, F·2N] whose column block f is subband
   f's interleaved sample stream. K is 512×-sparse but the dense MXU
   product still beats every layout-bound sparse formulation measured
   (17 ms tf32 vs 30.7 for the einsum; framed/merged variants slower).

2. **Multi-subband Gram kernel over Y's column blocks.** One grid
   dimension over chunk groups; per program the full-width input block
   streams into VMEM ONCE (contiguous rows — no per-subband strided
   re-reads) and each subband's 2N-wide column slice is Gram-ed with
   the same symmetric bf16 hi/lo split as the narrowband production
   kernel (~16 input mantissa bits at 2 single-pass MXU dots). At the
   c5 shape the per-subband width 2N = 128: every dot is full-lane.
   `sb_group` consolidates adjacent subbands into one (g·2N, g·2N)
   Gram to trade wasted off-diagonal flops for fewer small-matmul
   issues (the measured kernel cost currency — docs/PERF.md lesson 2).

Downstream (window prefix-sums, planar/Jp embed, correction fold) is
shared with the narrowband stacked path (cov_embedded).

Reference semantics: per-subband autocorrelate windows (SURVEY §2.1 C1
applied per channelizer branch; BASELINE config 5), correction fold
(C5) via the covariance identity.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doa_tpu.ops.pallas.cov_embedded import (
    _perm_interleaved_to_planar, interleave_factor,
    uhat_windows_to_embedded)


def channelizer_matrix(F: int, N: int) -> np.ndarray:
    """(F·2N, F·2N) f32 K with (frames @ K) = channelized-interleaved.

    K[t·2N+a, f·2N+b] = Wr[f,t]·I[a,b] + Wi[f,t]·Sw[a,b], W the F-point
    DFT (W[f,t] = exp(-2πj·f·t/F), matching ops.wideband.dft_matrix);
    Sw[2n, 2n+1] = 1, Sw[2n+1, 2n] = -1 so that per complex pair
    y = Wr·x + Wi·(j-swap of x) reproduces (Wr + jWi)(xr + jxi)."""
    f = np.arange(F)[:, None]
    t = np.arange(F)[None, :]
    Wc = np.exp(-2j * np.pi * f * t / F)
    eye = np.eye(2 * N, dtype=np.float64)
    Sw = np.zeros((2 * N, 2 * N), np.float64)
    n = np.arange(N)
    Sw[2 * n, 2 * n + 1] = 1.0
    Sw[2 * n + 1, 2 * n] = -1.0
    K = (np.einsum("ft,ab->tafb", Wc.real, eye)
         + np.einsum("ft,ab->tafb", Wc.imag, Sw))
    return K.reshape(F * 2 * N, F * 2 * N).astype(np.float32)


def channelize_frames(xil, K, F: int, N: int, tp: int):
    """xil: f32[T/tp, 2N·tp] interleaved rows → Y: f32[M, F·2N]
    channelized-interleaved (column block f = subband f's stream).

    Needs tp | F so whole frames tile the flat sample sequence; the
    frame reshape is metadata-only. Value-carrying → tensorfloat32."""
    if F % tp:
        raise ValueError(f"need TPACK ({tp}) | num_subbands ({F})")
    rows, width = xil.shape
    assert width == 2 * N * tp
    M = (rows * tp) // F
    xf = xil[: (M * F) // tp].reshape(M, F * 2 * N)
    with jax.default_matmul_precision("tensorfloat32"):
        return jnp.dot(xf, K, preferred_element_type=jnp.float32)


def _subband_gram_kernel_embedded(y_ref, pm_ref, t1_ref, t2_ref, e_ref,
                                  *, F: int, n2: int, g: int, cb: int,
                                  scale: float, compute_dtype):
    """Per program: cb chunks × F subbands of EMBEDDED covariance
    chunks E_c = Gram(y P̃ᵀ) + Gram(y M̃ᵀ) with the correction masks and
    1/S_sub scale folded in-VMEM — no XLA embed stage afterwards.

    P̃ (interleaved→planar) and M̃ = Jp P̃ are SIGNED PERMUTATIONS, so the
    permute dots are EXACT at DEFAULT (single-pass bf16) precision: the
    operands are already bf16 (the Gram's hi/lo split planes), the
    matrix entries are ±1 (exact in bf16), and each output lane is ± one
    input value — no accumulation, no rounding. pm_ref packs [P̃ᵀ | M̃ᵀ]
    as (2N, 4N) so one dot per subband per split plane permutes both
    bases; the two Grams then consolidate as one Gram of the
    row-stacked (2g, 2N) plane (Gram(y1)+Gram(y2) = Gram([y1; y2])).

    Correction: E ← (E∘T1 + rowswap(E)∘T2)·scale with rowswap = the
    row-halves swap (see uhat_windows_to_embedded) — elementwise VPU
    work, linear in E, so it commutes with the window prefix-sums
    outside."""
    f32 = jnp.float32
    N = n2 // 2
    dperm = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    gram = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    PM = pm_ref[...]
    T1 = t1_ref[...]
    T2 = t2_ref[...]
    z = y_ref[...]                                   # (cb·g, F·2N)
    if compute_dtype != f32:
        z_hi = z.astype(compute_dtype)
        z_lo = None
    else:
        z_hi = z.astype(jnp.bfloat16)
        z_lo = (z - z_hi.astype(f32)).astype(jnp.bfloat16)
    PMh = PM.astype(z_hi.dtype)       # ±1 exact in bf16/any dtype
    for f in range(F):
        sl = slice(f * n2, (f + 1) * n2)
        y_hi = dperm(z_hi[:, sl], PMh)               # (cb·g, 4N) exact
        y_lo = dperm(z_lo[:, sl], PMh) if z_lo is not None else None
        for c in range(cb):
            rows = slice(c * g, (c + 1) * g)
            ah = jnp.concatenate(
                [y_hi[rows, :n2], y_hi[rows, n2:]], axis=0)
            if y_lo is None:
                U = gram(ah.astype(compute_dtype),
                         ah.astype(compute_dtype))
            else:
                ah = ah.astype(jnp.bfloat16)
                al = jnp.concatenate(
                    [y_lo[rows, :n2], y_lo[rows, n2:]],
                    axis=0).astype(jnp.bfloat16)
                hl = gram(ah, al)
                U = gram(ah, ah) + hl + hl.T
            Usw = jnp.concatenate([U[N:, :], U[:N, :]], axis=0)
            e_ref[f, c * n2:(c + 1) * n2, :] = (
                U * T1 + Usw * T2) * scale


def _bitrev(p: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (p & 1)
        p >>= 1
    return r


def _wideband_fft_gram_kernel(x_ref, p_ref, t1_ref, t2_ref, e_ref, *,
                              F: int, n2: int, g: int, cb: int,
                              scale: float, compute_dtype):
    """Fully fused wideband front-end: raw interleaved FRAMES →
    per-chunk embedded subband covariances, one kernel. Replaces the
    dense channelizer matmul (F× the useful flops — the DFT contracts
    only over the F time-steps within a frame) AND its 2·M·F·2N·4-byte
    HBM round trip.

    Per program: (1) planarize each frame's F interleaved 2N-blocks by
    exact hi/lo permute dots (±1 matrix, DEFAULT precision — see
    _subband_gram_kernel_embedded); (2) radix-2 DIF FFT across the F
    tile-blocks in full f32 VPU arithmetic — complex add/sub are
    whole-tile adds in the planar layout, twiddle muls use the
    lane-halves swap y↦[−im|re] (= right-mult by Jpᵀ, a concat);
    (3) per-chunk Grams of the row-stacked [y, y·Jpᵀ] planes (hi/lo
    split) = the embedded E, correction and scale folded — identical
    tail to _subband_gram_kernel_embedded. DIF emits subband f at
    tile position bitrev(f), handled at the output write."""
    f32 = jnp.float32
    N = n2 // 2
    dperm = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    gram = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    jswap = lambda y: jnp.concatenate(  # noqa: E731  — y @ Jpᵀ
        [-y[:, N:], y[:, :N]], axis=1)
    Pt = p_ref[...]
    T1 = t1_ref[...]
    T2 = t2_ref[...]
    z = x_ref[...]                                   # (cb·g, F·2N)
    # planarize: v[t] = exact planar f32 tile of frame time-step t
    if compute_dtype != f32:
        zc = z.astype(compute_dtype)
        Pc = Pt.astype(compute_dtype)
        v = [dperm(zc[:, t * n2:(t + 1) * n2], Pc) for t in range(F)]
    else:
        z_hi = z.astype(jnp.bfloat16)
        z_lo = (z - z_hi.astype(f32)).astype(jnp.bfloat16)
        Pb = Pt.astype(jnp.bfloat16)
        v = [dperm(z_hi[:, t * n2:(t + 1) * n2], Pb)
             + dperm(z_lo[:, t * n2:(t + 1) * n2], Pb)
             for t in range(F)]
    # radix-2 DIF across tile-blocks (unnormalized forward DFT,
    # W[f,t] = exp(-2πj f t / F) — matches ops.wideband.dft_matrix)
    m = F
    while m >= 2:
        half = m // 2
        for start in range(0, F, m):
            for j in range(half):
                a = v[start + j]
                b = v[start + j + half]
                v[start + j] = a + b
                d = a - b
                if j == 0:
                    v[start + j + half] = d
                else:
                    ang = -2.0 * np.pi * j / m
                    wr = float(np.cos(ang))
                    wi = float(np.sin(ang))
                    if abs(wr) < 1e-12:          # w = ±j exactly
                        v[start + j + half] = (
                            jswap(d) if wi > 0 else -jswap(d))
                    else:
                        v[start + j + half] = wr * d + wi * jswap(d)
        m = half
    nbits = F.bit_length() - 1
    for f in range(F):
        y = v[_bitrev(f, nbits)]                     # subband f, planar
        if compute_dtype != f32:
            y_hi = y.astype(compute_dtype)
            y_lo = None
        else:
            y_hi = y.astype(jnp.bfloat16)
            y_lo = (y - y_hi.astype(f32)).astype(jnp.bfloat16)
        for c in range(cb):
            rows = slice(c * g, (c + 1) * g)
            yh = y_hi[rows]
            ah = jnp.concatenate([yh, jswap(yh)], axis=0)
            if y_lo is None:
                U = gram(ah, ah)
            else:
                yl = y_lo[rows]
                al = jnp.concatenate([yl, jswap(yl)], axis=0)
                hl = gram(ah, al)
                U = gram(ah, ah) + hl + hl.T
            Usw = jnp.concatenate([U[N:, :], U[:N, :]], axis=0)
            e_ref[f, c * n2:(c + 1) * n2, :] = (
                U * T1 + Usw * T2) * scale


def _subband_gram_kernel(y_ref, u_ref, *, F: int, n2: int, g: int,
                         cb: int, sbg: int, compute_dtype):
    """Per program: cb chunks × F subbands of (g, 2N)ᵀ(g, 2N) Grams,
    hi/lo split f32 (see cov_embedded._cov_kernel_uhat), consolidated
    sb_group subbands per MXU dot."""
    f32 = jnp.float32
    gram = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    for c in range(cb):
        rows = slice(c * g, (c + 1) * g)
        for f0 in range(0, F, sbg):
            z = y_ref[rows, f0 * n2:(f0 + sbg) * n2]
            if compute_dtype != f32:
                zb = z.astype(compute_dtype)
                U = gram(zb, zb)
            else:
                z_hi = z.astype(jnp.bfloat16)
                z_lo = (z - z_hi.astype(f32)).astype(jnp.bfloat16)
                hl = gram(z_hi, z_lo)
                U = gram(z_hi, z_hi) + hl + hl.T
            for s in range(sbg):
                u_ref[f0 + s, c * n2:(c + 1) * n2, :] = (
                    U[s * n2:(s + 1) * n2, s * n2:(s + 1) * n2])


@functools.partial(jax.jit, static_argnames=(
    "F", "N", "g", "chunks_per_block", "sb_group", "compute_dtype",
    "interpret"))
def subband_grams_pallas(y, *, F: int, N: int, g: int,
                         chunks_per_block: int | None = None,
                         sb_group: int = 1,
                         compute_dtype=jnp.float32,
                         interpret: bool = False):
    """y: f32[M, F·2N] channelized-interleaved → unnormalized per-chunk
    interleaved-basis Grams f32[F, n, 2N, 2N], n = M//g chunks of g
    subband samples each."""
    M, width = y.shape
    n2 = 2 * N
    assert width == F * n2
    n = M // g
    cb = chunks_per_block
    if cb is None:
        # in-block (cb·g·F·2N) + out-block (F·cb·2N·2N) both double-
        # buffered: budget ~6 MB of the ~16 MB VMEM for one buffer set.
        per_chunk = g * width * 4 + F * n2 * n2 * 4
        cb = max(1, min(8, (6 << 20) // max(per_chunk, 1)))
    while n % cb:
        cb //= 2
    cb = max(cb, 1)
    sbg = sb_group
    while F % sbg:
        sbg //= 2
    sbg = max(sbg, 1)

    U = pl.pallas_call(
        functools.partial(_subband_gram_kernel, F=F, n2=n2, g=g, cb=cb,
                          sbg=sbg, compute_dtype=compute_dtype),
        grid=(n // cb,),
        in_specs=[
            pl.BlockSpec((cb * g, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, cb * n2, n2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n * n2, n2), jnp.float32),
        interpret=interpret,
    )(y[: n * g])
    return U.reshape(F, n, n2, n2)


@functools.partial(jax.jit, static_argnames=(
    "F", "N", "g", "scale", "chunks_per_block", "compute_dtype",
    "interpret"))
def subband_embedded_pallas(y, cr, ci, *, F: int, N: int, g: int,
                            scale: float,
                            chunks_per_block: int | None = None,
                            compute_dtype=jnp.float32,
                            interpret: bool = False):
    """y: f32[M, F·2N] channelized-interleaved → per-chunk EMBEDDED
    covariance chunks f32[F, n, 2N, 2N] with the correction (c cᴴ) and
    `scale` folded in-kernel (see _subband_gram_kernel_embedded) —
    windows are prefix-sums of these chunks (all folds are linear)."""
    M, width = y.shape
    n2 = 2 * N
    assert width == F * n2
    n = M // g
    cb = chunks_per_block
    if cb is None:
        # in (cb·g·F·2N) + out (F·cb·2N·2N) + hi/lo bf16 planes, all
        # double-buffered: same ~6 MB budget as the uhat variant.
        per_chunk = g * width * 6 + F * n2 * n2 * 4
        cb = max(1, min(8, (6 << 20) // max(per_chunk, 1)))
    while n % cb:
        cb //= 2
    cb = max(cb, 1)

    Pm = _perm_interleaved_to_planar(N)
    Jp = np.zeros((n2, n2), np.float32)
    Jp[:N, N:] = -np.eye(N, dtype=np.float32)
    Jp[N:, :N] = np.eye(N, dtype=np.float32)
    PM = np.concatenate([Pm.T, (Jp @ Pm).T], axis=1)  # (2N, 4N)
    Wre = cr[:, None] * cr[None, :] + ci[:, None] * ci[None, :]
    Wim = ci[:, None] * cr[None, :] - cr[:, None] * ci[None, :]
    T1 = jnp.concatenate(
        [jnp.concatenate([Wre, Wre], axis=1)] * 2, axis=0)
    T2 = jnp.concatenate(
        [jnp.concatenate([-Wim, -Wim], axis=1),
         jnp.concatenate([Wim, Wim], axis=1)], axis=0)

    E = pl.pallas_call(
        functools.partial(_subband_gram_kernel_embedded, F=F, n2=n2,
                          g=g, cb=cb, scale=scale,
                          compute_dtype=compute_dtype),
        grid=(n // cb,),
        in_specs=[
            pl.BlockSpec((cb * g, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, 2 * n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, cb * n2, n2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n * n2, n2), jnp.float32),
        interpret=interpret,
    )(y[: n * g], jnp.asarray(PM), T1, T2)
    return E.reshape(F, n, n2, n2)


@functools.partial(jax.jit, static_argnames=(
    "F", "N", "g", "scale", "chunks_per_block", "compute_dtype",
    "interpret"))
def subband_fft_embedded_pallas(xf, cr, ci, *, F: int, N: int, g: int,
                                scale: float,
                                chunks_per_block: int | None = None,
                                compute_dtype=jnp.float32,
                                interpret: bool = False):
    """xf: f32[M, F·2N] interleaved FRAMES (row m = F consecutive
    complex sample vectors) → per-chunk embedded covariance chunks
    f32[F, n, 2N, 2N]: in-kernel radix-2 FFT channelizer + Grams
    (_wideband_fft_gram_kernel). Requires F a power of two."""
    M, width = xf.shape
    n2 = 2 * N
    assert width == F * n2
    if F & (F - 1):
        raise ValueError("fft variant requires power-of-two subbands")
    n = M // g
    cb = chunks_per_block
    if cb is None:
        # input block + F planar f32 tiles (same total) + hi/lo planes
        # + out block, double-buffered: same ~6 MB budget discipline.
        per_chunk = g * width * 12 + F * n2 * n2 * 4
        cb = max(1, min(8, (6 << 20) // max(per_chunk, 1)))
    while n % cb:
        cb //= 2
    cb = max(cb, 1)

    Pm = _perm_interleaved_to_planar(N)
    Wre = cr[:, None] * cr[None, :] + ci[:, None] * ci[None, :]
    Wim = ci[:, None] * cr[None, :] - cr[:, None] * ci[None, :]
    T1 = jnp.concatenate(
        [jnp.concatenate([Wre, Wre], axis=1)] * 2, axis=0)
    T2 = jnp.concatenate(
        [jnp.concatenate([-Wim, -Wim], axis=1),
         jnp.concatenate([Wim, Wim], axis=1)], axis=0)

    E = pl.pallas_call(
        functools.partial(_wideband_fft_gram_kernel, F=F, n2=n2,
                          g=g, cb=cb, scale=scale,
                          compute_dtype=compute_dtype),
        grid=(n // cb,),
        in_specs=[
            pl.BlockSpec((cb * g, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, cb * n2, n2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n * n2, n2), jnp.float32),
        interpret=interpret,
    )(xf[: n * g], jnp.asarray(Pm.T), T1, T2)
    return E.reshape(F, n, n2, n2)


@functools.partial(jax.jit, static_argnames=(
    "N", "F", "snapshot_size", "overlap", "compute_dtype",
    "chunks_per_block", "sb_group", "variant", "interpret"))
def wideband_cov_embedded_pallas(xil, K, cr, ci, *, N: int, F: int,
                                 snapshot_size: int, overlap: int = 0,
                                 compute_dtype=jnp.float32,
                                 chunks_per_block: int | None = None,
                                 sb_group: int = 1,
                                 variant: str = "auto",
                                 interpret: bool = False):
    """xil: f32[T/tp, 2N·tp] interleaved capture; K: channelizer matrix
    (channelizer_matrix(F, N); may be None on the fft path, which
    needs no channelizer constant); cr/ci: f32[N] correction →
    per-subband embedded covariance windows E_sub: f32[F, B, 2N, 2N]
    (normalized by S_sub, correction folded per subband — exact: the
    per-channel correction commutes with the per-channel DFT).

    variant="fft" (the "auto" default for power-of-two F — measured
    13.2 ms vs 29.9/78.2 at the c5 shape): channelizer folded INTO the
    kernel as a radix-2 FFT across frame time-steps (drops the dense
    matmul's F× extra flops and the channelized stream's HBM round
    trip). "embedded": dense-matmul channelizer + permute-before-Gram
    embedded-emit kernel ("auto" falls back here for non-pow2 F).
    "uhat": interleaved-basis Gram kernel + XLA embed einsums (the
    einsums make 4 tf32 passes over the 2.1 GB window stack).

    Framing matches ops.wideband.subband_covariances: subband snapshot
    S_sub = snapshot_size // F, hop_sub = max(S_sub - overlap // F, 1),
    windows via gcd-granularity chunk prefix sums (any overlap with
    g | M)."""
    S = snapshot_size
    if S % F:
        raise ValueError("snapshot_size must be divisible by num_subbands")
    S_sub = S // F
    hop_sub = max(S_sub - overlap // F, 1)
    g = math.gcd(S_sub, hop_sub)
    tp = interleave_factor(N)
    n2 = 2 * N
    if variant == "auto":
        variant = "embedded" if F & (F - 1) else "fft"
    if variant == "fft":
        if F % tp:
            raise ValueError(f"need TPACK ({tp}) | num_subbands ({F})")
        rows = xil.shape[0]
        M = (rows * tp) // F
        xf = xil[: (M * F) // tp].reshape(M, F * n2)  # frames (free)
        E = subband_fft_embedded_pallas(
            xf, cr, ci, F=F, N=N, g=g, scale=1.0 / S_sub,
            chunks_per_block=chunks_per_block,
            compute_dtype=compute_dtype, interpret=interpret)
    else:
        Y = channelize_frames(xil, K, F, N, tp)      # (M, F·2N)
        M = Y.shape[0]
        E = None
    n_win = S_sub // g
    stride = hop_sub // g
    B = 0 if M < S_sub else (M - S_sub) // hop_sub + 1
    if variant == "embedded":
        E = subband_embedded_pallas(
            Y, cr, ci, F=F, N=N, g=g, scale=1.0 / S_sub,
            chunks_per_block=chunks_per_block,
            compute_dtype=compute_dtype,
            interpret=interpret)                      # (F, n, 2N, 2N)
    if E is not None:
        if n_win == 1:
            return E[:, :B]
        csum = jnp.concatenate(
            [jnp.zeros((F, 1, n2, n2), E.dtype),
             jnp.cumsum(E, axis=1)], axis=1)
        lo = csum[:, 0:(B - 1) * stride + 1:stride]
        hi = csum[:, n_win:n_win + (B - 1) * stride + 1:stride]
        return hi - lo
    U = subband_grams_pallas(
        Y, F=F, N=N, g=g, chunks_per_block=chunks_per_block,
        sb_group=sb_group, compute_dtype=compute_dtype,
        interpret=interpret)                          # (F, n, 2N, 2N)
    n = U.shape[1]
    if n_win == 1:
        Uw = U[:, :B]
    else:
        csum = jnp.concatenate(
            [jnp.zeros((F, 1, n2, n2), U.dtype),
             jnp.cumsum(U, axis=1)], axis=1)
        lo = csum[:, 0:(B - 1) * stride + 1:stride]
        hi = csum[:, n_win:n_win + (B - 1) * stride + 1:stride]
        Uw = hi - lo
    W = (cr[:, None] * cr[None, :] + ci[:, None] * ci[None, :],
         ci[:, None] * cr[None, :] - cr[:, None] * ci[None, :])
    return uhat_windows_to_embedded(Uw, N, 1.0 / S_sub, W, fb=False)
