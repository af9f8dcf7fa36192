"""Beamforming: extract per-source waveforms after DoA (MVDR / Capon
weights). Beyond the reference (gr-doa only estimates angles); a DF
deployment that localizes an emitter usually wants to LISTEN to it —
this closes that loop on the same covariance and steering machinery.

MVDR weights toward angle θ:  w = R⁻¹ a(θ) / (a(θ)ᴴ R⁻¹ a(θ))
(unit gain toward θ, interference + noise power minimized). Computed on
the real embedding with a Cholesky solve (complex-free), then applied to
the sample stream window-by-window: y[t] = wᴴ x[t].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from doa_tpu.cpx import Cpx, embed_hermitian, embed_vector


def mvdr_weights_cpx(R: Cpx, a: Cpx, diag_load: float = 1e-3) -> Cpx:
    """R: Cpx[B, N, N], steering a: Cpx[B, N] (per-window look direction)
    → weights w: Cpx[B, N].

    Solved on the 2N embedding: E(R)ũ = ã, w̃ = ũ / (ãᵀũ); the embedded
    solution maps back to the complex weights exactly."""
    N = R.shape[-1]
    tr = jnp.trace(R.re, axis1=-2, axis2=-1) / N
    eye = jnp.eye(N, dtype=R.re.dtype)
    Rl = Cpx(R.re + (diag_load * tr)[..., None, None] * eye, R.im)
    E = embed_hermitian(Rl)                       # (B, 2N, 2N) SPD
    at = embed_vector(a)                          # (B, 2N)
    L = jax.lax.linalg.cholesky(E)
    u = jax.lax.linalg.triangular_solve(
        L, at[..., None], left_side=True, lower=True)
    u = jax.lax.linalg.triangular_solve(
        L, u, left_side=True, lower=True, transpose_a=True)
    u = u[..., 0]                                 # (B, 2N) = E⁻¹ ã
    den = jnp.sum(at * u, axis=-1, keepdims=True)  # ãᵀE⁻¹ã = Re(aᴴR⁻¹a)
    u = u / jnp.maximum(den, 1e-30)
    return Cpx(u[..., :N], u[..., N:])


def apply_beamformer_cpx(x_windows: Cpx, w: Cpx) -> Cpx:
    """x_windows: Cpx[B, S, N] (framed samples), w: Cpx[B, N] →
    beamformed output y: Cpx[B, S]: y[t] = Σ_n conj(w_n)·x[t, n]."""
    wc = w.conj()
    re = (jnp.einsum("bsn,bn->bs", x_windows.re, wc.re,
                     preferred_element_type=jnp.float32)
          - jnp.einsum("bsn,bn->bs", x_windows.im, wc.im,
                       preferred_element_type=jnp.float32))
    im = (jnp.einsum("bsn,bn->bs", x_windows.re, wc.im,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bsn,bn->bs", x_windows.im, wc.re,
                       preferred_element_type=jnp.float32))
    return Cpx(re, im)


def extract_source_ula(x: Cpx, R: Cpx, theta_deg, norm_spacing: float,
                       snapshot_size: int, diag_load: float = 1e-3) -> Cpx:
    """End-to-end extraction: samples x: Cpx[T, N] + per-window covariance
    R: Cpx[B, N, N] + per-window look angles theta_deg f32[B] →
    beamformed stream Cpx[B, S] (window-wise MVDR toward theta).

    Non-overlapping framing (beamformed audio shouldn't double samples).
    """
    T, N = x.shape
    S = snapshot_size
    B = R.shape[0]
    theta = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
    k = jnp.arange(N, dtype=jnp.float32)
    phase = -2.0 * jnp.pi * norm_spacing * jnp.cos(theta)[..., None] * k
    a = Cpx(jnp.cos(phase), jnp.sin(phase))       # (B, N)
    w = mvdr_weights_cpx(R, a, diag_load)
    xw = Cpx(x.re[: B * S].reshape(B, S, N), x.im[: B * S].reshape(B, S, N))
    return apply_beamformer_cpx(xw, w)
