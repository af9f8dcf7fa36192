"""Fused interleaved-ingest covariance kernel: raw IQ → embedded E(R).

THE production covariance path. Three insights compound here:

1. **Interleaved-128 ingest layout.** A C-ordered complex64 capture
   (T, N) is, byte-for-byte, the f32 sequence
   [t0c0.re, t0c0.im, t0c1.re, …] — so for 2N·TPACK = 128
   (TPACK = 128//2N time-steps per row) the RAW RECEIVER BUFFER
   reinterpreted as f32[T/TPACK, 128] is already a perfectly
   lane-aligned TPU array: zero host preprocessing (no re/im
   deinterleave), zero HBM padding (split planes f32[T, 16] pad 8× in
   VMEM), one full-bandwidth read.

2. **Full-lane Gram.** The 128-wide row Gram Zᵀ Z (contraction T/TPACK)
   runs the MXU at full lane utilization; its TPACK diagonal (2N, 2N)
   blocks sum to the per-chunk Gram U = Σ_t u_t u_tᵀ of the interleaved
   real sample vectors. Off-diagonal blocks cost TPACK× extra flops but
   the op is ~16× more MXU-efficient than a (hop, 2N)-shaped Gram
   (measured: 12.3 ms → ~2 ms at the headline config), leaving the
   stage bandwidth-bound at full f32 precision — no bf16 compromise
   needed.

3. **Algebraic fusion.** With P the interleaved→planar permutation and
   Jp = [[0, −I], [I, 0]]:  E(R) = Ũ + Jp Ũ Jpᵀ,  Ũ = P U Pᵀ —
   so the kernel emits the EMBEDDED covariance E(R): f32[B, 2N, 2N]
   directly (what the subspace stage consumes), with the calibration
   correction ((c cᴴ) ∘ R), forward-backward averaging, and 1/S
   normalization all applied to the (2N, 2N) tiles in VMEM. Nothing
   else ever touches the sample stream.

Reference semantics: autocorrelate (SURVEY §2.1 C1) — snapshot windows,
overlap via hop-aligned chunks (window sums combined in XLA), optional
FB averaging; antenna_correction (C5) folded per the covariance
identity.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interleave_factor(N: int) -> int:
    """Time-steps per 128-lane row (1 when 2N ≥ 128)."""
    return max(1, 128 // (2 * N))


def to_interleaved(re, im):
    """Split planes f32[T, N] → interleaved rows f32[T/TPACK, 2N·TPACK].

    Library-path converter (the native ingest path skips this entirely:
    a raw c64 buffer IS this layout, io.native.as_interleaved).

    The interleave runs as two one-hot scatter matmuls on row-merged
    planes — NEVER via stack([re, im], -1): that (T, N, 2) intermediate
    tiles to 64× its logical bytes on TPU ((8,128) layout pads the
    size-2 minor dim to 128 lanes), 137 GB at the headline T=2²⁴."""
    T, N = re.shape
    tp = interleave_factor(N)
    width = 2 * N * tp
    j = np.arange(tp * N)
    Pr = np.zeros((tp * N, width), np.float32)
    Pi = np.zeros((tp * N, width), np.float32)
    Pr[j, 2 * N * (j // N) + 2 * (j % N)] = 1.0
    Pi[j, 2 * N * (j // N) + 2 * (j % N) + 1] = 1.0
    re_r = re.reshape(T // tp, tp * N)
    im_r = im.reshape(T // tp, tp * N)
    return (jnp.dot(re_r, jnp.asarray(Pr),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(im_r, jnp.asarray(Pi),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))


def _blockdiag_np(block: np.ndarray, n: int) -> np.ndarray:
    r, c = block.shape
    out = np.zeros((n * r, n * c), block.dtype)
    for i in range(n):
        out[i * r:(i + 1) * r, i * c:(i + 1) * c] = block
    return out


def _perm_interleaved_to_planar(N: int) -> np.ndarray:
    """(2N, 2N) permutation P with (P u)[planar] = u[interleaved]:
    planar row c ← interleaved row 2c (re), planar row N+c ← 2c+1."""
    P = np.zeros((2 * N, 2 * N), np.float32)
    for c in range(N):
        P[c, 2 * c] = 1.0
        P[N + c, 2 * c + 1] = 1.0
    return P


def _cov_kernel(z_ref, p_ref, wre_ref, wim_ref, e_ref, *, N: int,
                hop: int, tp: int, cb: int, fb: bool, scale: float,
                compute_dtype):
    """Per program: cb chunk Grams (full-lane MXU) + per-chunk
    interleaved→planar→embedded transform on (2N, 2N) tiles in VMEM.

    (A variant batching the basis changes program-wide through static
    block-diagonal right factors — fewer small ops — reliably crashes
    the TPU compile helper (SIGABRT) on this toolchain; the per-chunk
    form compiles and the small ops cost ~1 ms/call at the headline
    config.)"""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=hp)
    rows = hop // tp
    n2 = 2 * N
    Pm = p_ref[...]
    Wre = wre_ref[...]
    Wim = wim_ref[...]
    for c in range(cb):
        z = z_ref[c * rows:(c + 1) * rows, :]
        if compute_dtype != f32:
            z = z.astype(compute_dtype)
        U = jax.lax.dot_general(                     # (width, width)
            z, z, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=(hp if compute_dtype == f32
                       else jax.lax.Precision.DEFAULT))
        U32 = U[:n2, :n2]
        for i in range(1, tp):
            U32 = U32 + U[i * n2:(i + 1) * n2, i * n2:(i + 1) * n2]
        Ut = dot(dot(Pm, U32), Pm.T) * scale         # planar Ũ
        A, Bq = Ut[:N, :N], Ut[:N, N:]
        Cq, D = Ut[N:, :N], Ut[N:, N:]
        rr = A + D                                   # Rr (sym)
        ri = Cq - Bq                                 # Ri (antisym)
        rr, ri = (rr * Wre - ri * Wim, rr * Wim + ri * Wre)
        if fb:
            rr = 0.5 * (rr + rr[::-1, ::-1])
            ri = 0.5 * (ri - ri[::-1, ::-1])
        top = jnp.concatenate([rr, -ri], axis=-1)
        bot = jnp.concatenate([ri, rr], axis=-1)
        e_ref[c] = jnp.concatenate([top, bot], axis=0)


def uhat_windows_to_embedded(Uw, N: int, scale: float, W, fb: bool):
    """Interleaved-basis window Grams Uw: f32[..., 2N, 2N] → embedded
    covariance E(R): f32[..., 2N, 2N] with the calibration correction
    W = (c cᴴ) planes (Wre, Wim) folded in and optional forward-backward
    averaging — the shared post-transform of the stacked covariance
    kernels (narrowband and per-subband wideband).

    Basis transform + correction + FB run as batched XLA einsums at
    tensorfloat32 (value-carrying: single-pass bf16 would round R
    ~0.4% relative; Mosaic has no 3-pass mode — docs/PERF.md)."""
    n2 = 2 * N
    lead = Uw.shape[:-2]
    Uw = Uw.reshape((-1, n2, n2))
    Pm_np = _perm_interleaved_to_planar(N)
    with jax.default_matmul_precision("tensorfloat32"):
        Jp = np.zeros((n2, n2), np.float32)
        Jp[:N, N:] = -np.eye(N, dtype=np.float32)
        Jp[N:, :N] = np.eye(N, dtype=np.float32)
        M = jnp.asarray(Jp @ Pm_np)
        P = jnp.asarray(Pm_np)
        bmm = lambda a, b: jnp.einsum(  # noqa: E731
            "bij,jk->bik", a, b, preferred_element_type=jnp.float32)
        lmm = lambda a, b: jnp.einsum(  # noqa: E731
            "ij,bjk->bik", a, b, preferred_element_type=jnp.float32)
        E = (lmm(P, bmm(Uw, P.T))
             + lmm(M, bmm(Uw, M.T))) * scale
        # correction (c cᴴ)∘R on the embedding:
        #   E ← E∘T1 + (Fsw E)∘T2 with Fsw E = row-halves swapped
        T1b = jnp.concatenate(
            [jnp.concatenate([W[0], W[0]], axis=1)] * 2, axis=0)
        T2b = jnp.concatenate(
            [jnp.concatenate([-W[1], -W[1]], axis=1),
             jnp.concatenate([W[1], W[1]], axis=1)], axis=0)
        Esw = jnp.concatenate([E[:, N:, :], E[:, :N, :]], axis=1)
        E = E * T1b[None] + Esw * T2b[None]
        if fb:
            # ½(E + X₂ E X₂ᵀ), X₂ = blockdiag(X, −X), X exchange
            Xex = np.eye(N, dtype=np.float32)[::-1]
            X2 = np.zeros((n2, n2), np.float32)
            X2[:N, :N] = Xex
            X2[N:, N:] = -Xex
            X2 = jnp.asarray(X2)
            E = 0.5 * (E + lmm(X2, bmm(E, X2.T)))
    return E.reshape(lead + (n2, n2))


def _cov_kernel_uhat(z_ref, u_ref, *, N: int, hop: int, tp: int,
                     cb: int, compute_dtype):
    """Stacked variant kernel: emits the INTERLEAVED-BASIS chunk Grams
    Û_c = Σ_t u_t u_tᵀ (2N, 2N) only; the planar permutation, Jp embed,
    correction, and FB averaging run OUTSIDE in XLA on the (windowed)
    chunk stack — XLA supports the 3-pass tensorfloat32 precision these
    value-carrying transforms need, Mosaic only has 1-pass bf16 or
    6-pass f32 (measured: the in-kernel transform matmuls cost 13 ms at
    HIGHEST vs ~1.5 ms as batched XLA einsums at tf32).

    The f32 Gram runs as a symmetric bf16 hi/lo split:
        U = hhᵀhh + hiᵀlo + (hiᵀlo)ᵀ      (two single-pass MXU dots)
    which carries ~16 mantissa bits of the inputs (beyond any ADC) at
    one third the passes of Precision.HIGHEST. The time-diagonal block
    sum is exact VPU adds."""
    f32 = jnp.float32
    # precision pinned explicitly: an ambient default_matmul_precision
    # scope (the pipelines trace under tensorfloat32) would otherwise
    # leak in, and Mosaic cannot lower HIGH.
    gram = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    rows = hop // tp
    n2 = 2 * N
    outs = []
    for c in range(cb):
        z = z_ref[c * rows:(c + 1) * rows, :]
        if compute_dtype == jnp.int8:
            # int8 INGEST mode: the resident buffer is pre-quantized
            # int8 (io.native.quantize_interleaved_int8) — the Gram
            # runs int8×int8→int32 on the MXU (4× the f32 rate, ¼ the
            # input read) and is EXACT in int32; entries are ≤
            # rows·127² < 2²⁴ so the f32 cast below is exact too. R
            # carries the quantization scale² — every downstream
            # consumer is scale-invariant (subspace/MUSIC/peaks by
            # construction; Capon's diagonal load and the escalation
            # detector normalize by the trace).
            U = jax.lax.dot_general(
                z, z, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            u32 = U[0:n2, 0:n2]
            for i in range(1, tp):
                u32 = u32 + U[i * n2:(i + 1) * n2, i * n2:(i + 1) * n2]
            outs.append(u32.astype(f32))
            continue
        if compute_dtype != f32:
            zb = z.astype(compute_dtype)
            U = gram(zb, zb)
        else:
            z_hi = z.astype(jnp.bfloat16)
            z_lo = (z - z_hi.astype(f32)).astype(jnp.bfloat16)
            hl = gram(z_hi, z_lo)
            U = gram(z_hi, z_hi) + hl + hl.T
        u32 = U[0:n2, 0:n2]
        for i in range(1, tp):
            u32 = u32 + U[i * n2:(i + 1) * n2, i * n2:(i + 1) * n2]
        outs.append(u32)
    u_ref[...] = jnp.concatenate(outs, axis=0)       # (cb·2N, 2N)


@functools.partial(jax.jit, static_argnames=(
    "N", "snapshot_size", "overlap", "fb", "compute_dtype",
    "chunks_per_block", "variant", "interpret"))
def cov_embedded_pallas(xil, cr, ci, *, N: int, snapshot_size: int,
                        overlap: int = 0, fb: bool = False,
                        compute_dtype=jnp.float32,
                        chunks_per_block: int | None = None,
                        variant: str = "stacked",
                        interpret: bool = False):
    """xil: f32[T/TPACK, 2N·TPACK] interleaved rows; cr/ci: f32[N]
    correction → E(R) windows f32[B, 2N, 2N] (normalized by S,
    correction + optional FB folded). Any 0 ≤ overlap < S with
    TPACK | gcd(S, hop): chunks at gcd granularity, windows by strided
    prefix-sum differences (reference sliding-window semantics)."""
    import math

    S = snapshot_size
    hop = S - overlap
    tp = interleave_factor(N)
    g = math.gcd(S, hop)
    if g % tp:
        raise ValueError(
            f"need TPACK ({tp}) | gcd(S, hop) ({g}) on the interleaved "
            "path — use the planes path for this overlap")
    if compute_dtype == jnp.int8:
        if variant != "stacked":
            raise ValueError("int8 ingest supports the stacked variant")
        if xil.dtype != jnp.int8:
            raise ValueError(
                "cov_dtype='int8' is the INGEST-quantized mode: feed a "
                "pre-quantized int8 buffer "
                "(io.native.quantize_interleaved_int8)")
    Trows, width = xil.shape
    assert width == 2 * N * tp
    T = Trows * tp
    n = T // g
    B = 0 if T < S else (T - S) // hop + 1
    n_win = S // g
    stride = hop // g
    hop = g          # kernel operates on gcd-granularity chunks
    cb = chunks_per_block
    if cb is None:
        # Bigger input blocks keep the DMA engines fed: cb=32 measured
        # 5.41 ms vs 6.07 at cb=8 for the headline config — ~80% of
        # this chip's MEASURED streaming bandwidth (~495 GB/s, which is
        # the achievable roofline; see exp_covk.py / docs/PERF.md).
        # Budget ~4 MB of VMEM for the input block (cb=64 failed to
        # compile at the headline shape; 32 is the measured sweet spot).
        per_chunk = max((g // tp) * width * 4, 1)
        cb = max(1, min(32, (4 << 20) // per_chunk))
    while n % cb:
        cb //= 2
    cb = max(cb, 1)

    # Correction pattern W = c cᴴ (applied pre-FB, matching C5's slot;
    # for the overlap path correction/FB are linear in R so folding them
    # into chunks before the window sum is exact).
    W = (cr[:, None] * cr[None, :] + ci[:, None] * ci[None, :],
         ci[:, None] * cr[None, :] - cr[:, None] * ci[None, :])

    n2 = 2 * N
    Pm_np = _perm_interleaved_to_planar(N)
    rows = hop // tp

    if variant == "stacked":
        Us = pl.pallas_call(
            functools.partial(_cov_kernel_uhat, N=N, hop=hop, tp=tp,
                              cb=cb, compute_dtype=compute_dtype),
            grid=(n // cb,),
            in_specs=[
                pl.BlockSpec((cb * rows, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cb * n2, n2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n * n2, n2), jnp.float32),
            interpret=interpret,
        )(xil[: (n * hop) // tp])
        U = Us.reshape(n, n2, n2)                    # interleaved basis
        # windows FIRST (linear ops all commute with the chunk sum)
        if n_win == 1:
            Uw = U[:B]
        else:
            csum = jnp.concatenate(
                [jnp.zeros((1, n2, n2), U.dtype),
                 jnp.cumsum(U, axis=0)], axis=0)
            lo = csum[0:(B - 1) * stride + 1:stride]
            hi = csum[n_win:n_win + (B - 1) * stride + 1:stride]
            Uw = hi - lo
        return uhat_windows_to_embedded(Uw, N, 1.0 / S, W, fb)
    else:
        E = pl.pallas_call(
            functools.partial(_cov_kernel, N=N, hop=hop, tp=tp, cb=cb,
                              fb=fb, scale=1.0 / S,
                              compute_dtype=compute_dtype),
            grid=(n // cb,),
            in_specs=[
                pl.BlockSpec((cb * rows, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cb, n2, n2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, n2, n2), jnp.float32),
            interpret=interpret,
        )(xil[: (n * hop) // tp], jnp.asarray(Pm_np), W[0], W[1])

    if n_win == 1:
        return E[:B]
    csum = jnp.concatenate(
        [jnp.zeros((1,) + E.shape[1:], E.dtype), jnp.cumsum(E, axis=0)],
        axis=0)
    lo = csum[0:(B - 1) * stride + 1:stride]
    hi = csum[n_win:n_win + (B - 1) * stride + 1:stride]
    return hi - lo
