"""MVDR beamforming: unit gain toward the look direction, interference
rejection, and end-to-end waveform recovery."""

import numpy as np
import jax.numpy as jnp

import golden
from doa_tpu.cpx import Cpx
from doa_tpu.ops.beamform import (
    apply_beamformer_cpx, extract_source_ula, mvdr_weights_cpx)


def test_unit_gain_constraint():
    x = golden.synthetic_ula_iq([70.0, 120.0], 8, 0.5, 16384, snr_db=10,
                                seed=0)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    a_np = golden.ula_steering(70.0, 8, 0.5).astype(np.complex64)
    B = R.shape[0]
    a = Cpx.from_complex(np.broadcast_to(a_np, (B, 8)).copy())
    w = mvdr_weights_cpx(Cpx.from_complex(R), a).to_numpy()
    gain = np.einsum("bn,bn->b", w.conj(), np.broadcast_to(a_np, (B, 8)))
    np.testing.assert_allclose(gain.real, 1.0, atol=1e-3)
    np.testing.assert_allclose(gain.imag, 0.0, atol=1e-3)


def test_interference_rejection_and_recovery():
    # Two tones from different angles; beam toward source 1 must recover
    # its waveform and suppress source 2 strongly.
    N, S, B = 8, 2048, 8
    T = B * S
    rng = np.random.default_rng(1)
    t = np.arange(T)
    s1 = np.exp(1j * 2 * np.pi * 0.11 * t)
    s2 = np.exp(1j * 2 * np.pi * 0.29 * t)
    a1 = golden.ula_steering(70.0, N, 0.5)
    a2 = golden.ula_steering(120.0, N, 0.5)
    noise = (rng.standard_normal((T, N)) + 1j * rng.standard_normal((T, N))
             ) * np.sqrt(0.005)
    x = (np.outer(s1, a1) + np.outer(s2, a2) + noise).astype(np.complex64)
    R = golden.sample_covariance(golden.frame_samples(x, S, 0))
    y = extract_source_ula(
        Cpx.from_complex(x), Cpx.from_complex(R),
        np.full(B, 70.0, np.float32), 0.5, S).to_numpy()
    y_flat = y.reshape(-1)
    # correlation with s1 high, with s2 low
    c1 = np.abs(np.vdot(s1, y_flat)) / (np.linalg.norm(s1)
                                        * np.linalg.norm(y_flat))
    c2 = np.abs(np.vdot(s2, y_flat)) / (np.linalg.norm(s2)
                                        * np.linalg.norm(y_flat))
    assert c1 > 0.99, c1
    assert c2 < 0.05, c2
    # SIR improvement: output power ≈ source1 power (unit amplitude)
    np.testing.assert_allclose(np.mean(np.abs(y_flat) ** 2), 1.0,
                               rtol=0.05)


def test_apply_beamformer_matches_numpy():
    rng = np.random.default_rng(2)
    xw = (rng.standard_normal((3, 16, 4))
          + 1j * rng.standard_normal((3, 16, 4))).astype(np.complex64)
    w = (rng.standard_normal((3, 4))
         + 1j * rng.standard_normal((3, 4))).astype(np.complex64)
    y = apply_beamformer_cpx(Cpx.from_complex(xw),
                             Cpx.from_complex(w)).to_numpy()
    ref = np.einsum("bsn,bn->bs", xw, w.conj())
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
