"""Wideband DoA via per-subband channelization + incoherent fusion
(BASELINE config 5; no upstream equivalent — gr-doa is narrowband-only).

Pipeline: x[T, N] → F-point DFT channelizer (critically sampled: frames of
F consecutive samples, one DFT each → F subband streams at rate 1/F) →
per-subband covariance + MUSIC with a subband-scaled steering grid →
incoherent fusion (mean of max-normalized subband spectra).

The DFT runs as a planar complex matmul with the (F, F) DFT matrix —
complex-free (works on Pallas / complex-free backends) and MXU-shaped for
small F, which is exactly the subband-count regime (8–64) here.

Steering vs frequency: with array spacing d = norm_spacing wavelengths AT
THE CARRIER, a subband at baseband offset f_norm ∈ [-.5, .5) (fraction of
the sample rate) sees effective spacing d·(1 + f_norm·fractional_bw),
fractional_bw = samp_rate / carrier_freq.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from doa_tpu.configs import DoaConfig
from doa_tpu.cpx import Cpx
from doa_tpu.ops import cpx_ops


def subband_center_freqs(num_subbands: int) -> np.ndarray:
    """Normalized center frequency of each DFT bin, in [-0.5, 0.5)."""
    f = np.fft.fftfreq(num_subbands)
    return f.astype(np.float32)


def dft_matrix(F: int) -> np.ndarray:
    """(F, F) complex64 DFT matrix W[f, t] = exp(-2πj f t / F)."""
    f = np.arange(F)[:, None]
    t = np.arange(F)[None, :]
    return np.exp(-2j * np.pi * f * t / F).astype(np.complex64)


def channelize_cpx(x: Cpx, W: Cpx) -> Cpx:
    """x: Cpx[T, N] → subband streams Cpx[F, T//F, N].

    Frame T into T//F frames of F samples, DFT each frame:
    out[f, m, n] = Σ_t W[f, t] x[m·F + t, n].
    """
    F = W.shape[0]
    T, N = x.shape
    M = T // F
    xf = x[: M * F].reshape(M, F, N)
    # (F,F) × (M,F,N) → (M,F,N) contracting the frame-time axis.
    out = cpx_ops_einsum("ft,mtn->fmn", W, xf)
    return out


def cpx_ops_einsum(sub, a: Cpx, b: Cpx) -> Cpx:
    from doa_tpu.cpx import einsum
    return einsum(sub, a, b)


def wideband_steering_stack(cfg: DoaConfig, A_fn) -> np.ndarray:
    """Per-subband steering matrices A: complex64[F, G, N].

    A_fn(norm_spacing) → (G, N) complex steering matrix at a given
    effective spacing (curried over the config's grid + geometry).
    """
    F = cfg.wideband.num_subbands
    fbw = getattr(cfg.wideband, "fractional_bw", 0.0)
    freqs = subband_center_freqs(F)
    mats = [A_fn(cfg.geometry.norm_spacing * (1.0 + float(fn) * fbw))
            for fn in freqs]
    return np.stack(mats, axis=0)


def wideband_music_cpx(x: Cpx, A_stack: Cpx, W: Cpx, cfg: DoaConfig):
    """x: Cpx[T, N], A_stack: Cpx[F, G, N], W: DFT Cpx[F, F] →
    fused spectrum f32[B, G].

    Subband snapshot length = cfg.snapshot_size // F input samples worth of
    subband samples, so one fused output window spans the same wall-clock
    as a narrowband window. Overlap is applied in the subband domain.
    """
    F = W.shape[0]
    S = cfg.snapshot_size
    if S % F:
        raise ValueError("snapshot_size must be divisible by num_subbands")
    S_sub = S // F
    hop_sub = max(S_sub - cfg.overlap // F, 1)
    xs = channelize_cpx(x, W)                       # (F, M, N)
    Fb, M, N = xs.shape

    # Per-subband windowed covariance: vmap the chunked path over subbands.
    def cov_one(sub):
        return cpx_ops.cov_from_stream_cpx(
            sub, S_sub, S_sub - hop_sub,
            fb_average=False)

    R = jax.vmap(cov_one)(xs)                       # Cpx (F, B, N, N)

    if cfg.subspace_method == "power":
        V = jax.vmap(lambda r: cpx_ops.signal_subspace_embedded(
            r, cfg.num_sources, iters=cfg.power_iters))(R)

        def spec_one(v, Af):
            den = jnp.maximum(
                cpx_ops.music_denominator_subspace(v, Af), 0.0)
            P = 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
            return P / jnp.max(P, axis=-1, keepdims=True)

        P_sub = jax.vmap(spec_one)(V, A_stack)      # (F, B, G)
    else:
        M_proj = jax.vmap(
            lambda r: cpx_ops.noise_projector_cpx(r, cfg.num_sources))(R)

        def spec_one(mp, Af):
            den = cpx_ops.music_denominator_cpx(mp, Af)
            P = 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
            return P / jnp.max(P, axis=-1, keepdims=True)

        P_sub = jax.vmap(spec_one)(M_proj, A_stack)  # (F, B, G)
    return jnp.mean(P_sub, axis=0)                  # incoherent fusion
