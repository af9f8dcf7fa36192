"""Stage-2 calibration: antenna-element gain/phase corrections from a pilot
tone at a KNOWN angle (reference `calibrate_lin_array`, SURVEY §2.1 C4).

Per covariance window: principal eigenvector v1 of R spans the pilot's
signal subspace; the per-element correction is c_k = a_k(pilot)/v1_k,
normalized so the reference element's correction is exactly 1 (removes the
eigenvector's arbitrary global phase/scale). Batched over windows; the
averaging the reference does in `save_antenna_calib` (P3) is `average_corrections`.
"""

from __future__ import annotations

import functools

import jax

from doa_tpu.cpx import f32_matmuls as _f32_matmuls
import jax.numpy as jnp

from doa_tpu.ops.steering import ula_steering
from doa_tpu.ops.subspace import principal_eigvec


@functools.partial(jax.jit, static_argnames=("norm_spacing",))
@_f32_matmuls
def element_calibration(R, pilot_theta_deg, norm_spacing: float):
    """R: c64[B, N, N] (pilot-only capture) → corrections c: c64[B, N]."""
    v1 = principal_eigvec(R)                    # (B, N)
    N = R.shape[-1]
    a = ula_steering(pilot_theta_deg, N, norm_spacing)  # (N,)
    c = a[None, :] / v1
    return c / c[..., :1]


def average_corrections(c):
    """c: c64[B, N] per-window corrections → robust average c64[N].

    Gain (|c|) averages arithmetically; phase averages on the unit circle
    (reference save_antenna_calib averages the raw complex vectors, which
    under-weights windows with phase noise — this is strictly better and
    reduces to the same thing for consistent windows)."""
    mag = jnp.mean(jnp.abs(c), axis=0)
    ph = jnp.angle(jnp.mean(c / jnp.maximum(jnp.abs(c), 1e-30), axis=0))
    return (mag * jnp.exp(1j * ph)).astype(jnp.complex64)
