"""Stage-1 calibration: receiver-chain relative phase offsets
(reference `phase_offset_est` + the estimate_phase_offsets app, SURVEY §3.3).

All channels receive a common reference tone through a cable splitter; the
relative phase of chain k vs chain 0 is arg(E[x_k conj(x_0)]). One jitted
reduction over the whole capture — the reference's multiply-conjugate →
arg → average flowgraph collapsed into a single fused pass.
"""

from __future__ import annotations

import jax

from doa_tpu.cpx import f32_matmuls as _f32_matmuls
import jax.numpy as jnp


@jax.jit
@_f32_matmuls
def phase_offset_est(x, ref_channel: int = 0):
    """x: c64[T, N] common-tone capture → phi: f32[N] radians
    (phi[ref_channel] == 0). Averaging the complex product before taking
    arg weights by instantaneous SNR and avoids phase-wrap bias."""
    ref = jax.lax.dynamic_slice_in_dim(x, ref_channel, 1, axis=1)
    z = jnp.mean(x * jnp.conj(ref), axis=0)
    return jnp.angle(z).astype(jnp.float32)


def phase_correction(phi):
    """phi: f32[N] → correction vector c: c64[N], c_k = exp(-j phi_k)
    (reference phase_correct_hier semantics: multiply channel k by
    exp(-j phi_k))."""
    return jnp.exp(-1j * jnp.asarray(phi)).astype(jnp.complex64)
