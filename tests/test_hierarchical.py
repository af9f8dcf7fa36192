"""Hierarchical coarse→refine MUSIC: sub-grid accuracy from a coarse grid
must match (or beat) a dense fine grid at a fraction of the scan cost."""

import numpy as np
import jax.numpy as jnp

import golden
from doa_tpu.cpx import Cpx
from doa_tpu.ops import cpx_ops
from doa_tpu.ops.hierarchical import (
    music_hierarchical_ula, refine_peaks_ula, ula_denominator_at)


def _subspace(thetas, N=16, T=65536, snr=15, seed=3):
    x = golden.synthetic_ula_iq(thetas, N, 0.5, T, snr_db=snr, seed=seed)
    R = golden.sample_covariance(golden.frame_samples(x, 4096, 0))
    V = cpx_ops.signal_subspace_embedded(Cpx.from_complex(R),
                                         len(thetas), iters=16)
    return V


def test_denominator_at_matches_grid():
    V = _subspace([72.0])
    grid = np.linspace(0, 180, 181).astype(np.float32)
    A = Cpx.from_complex(golden.ula_steering(grid, 16, 0.5).astype(
        np.complex64))
    den_grid = np.asarray(cpx_ops.music_denominator_subspace(V, A))
    B = den_grid.shape[0]
    theta = jnp.broadcast_to(jnp.asarray(grid), (B, 181))
    den_at = np.asarray(ula_denominator_at(V, theta, 0.5))
    np.testing.assert_allclose(den_at, den_grid, rtol=1e-3, atol=2e-3)


def test_hierarchical_beats_coarse_grid():
    theta_true = 72.317
    V = _subspace([theta_true], snr=20)
    # 1.4°-spaced coarse grid (129 points)
    grid = np.linspace(0, 180, 129)
    A = Cpx.from_complex(golden.ula_steering(grid, 16, 0.5).astype(
        np.complex64))
    vals, refined = music_hierarchical_ula(V, A, 1, 0.5)
    err = np.abs(np.asarray(refined) - theta_true)
    assert err.max() < 0.02, err.max()   # 70× finer than the coarse grid


def test_hierarchical_two_sources():
    truths = [61.43, 108.91]
    V = _subspace(truths, snr=15)
    grid = np.linspace(0, 180, 181)
    A = Cpx.from_complex(golden.ula_steering(grid, 16, 0.5).astype(
        np.complex64))
    vals, refined = music_hierarchical_ula(V, A, 2, 0.5)
    r = np.sort(np.asarray(refined), -1)
    assert np.abs(r[:, 0] - truths[0]).max() < 0.05, r
    assert np.abs(r[:, 1] - truths[1]).max() < 0.05, r


def test_hierarchical_int8_coarse():
    """Coarse pass in int8 + f32 refine: full accuracy at 4× coarse rate."""
    theta_true = 72.317
    V = _subspace([theta_true], snr=20)
    grid = np.linspace(0, 180, 129)
    A = Cpx.from_complex(golden.ula_steering(grid, 16, 0.5).astype(
        np.complex64))
    vals, refined = music_hierarchical_ula(
        V, A, 1, 0.5, compute_dtype=jnp.int8)
    err = np.abs(np.asarray(refined) - theta_true)
    assert err.max() < 0.05, err.max()


def test_pipeline_hierarchical_mode():
    import dataclasses
    from doa_tpu import PRESETS
    from doa_tpu.io import SourceSpec, synth_ula_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = dataclasses.replace(
        PRESETS["c2_ula8_2src"], scan_mode="hierarchical")
    x = synth_ula_iq(
        [SourceSpec(theta_deg=61.43, freq_norm=0.1),
         SourceSpec(theta_deg=108.91, freq_norm=0.31)],
        8, 0.5, 8 * 2048, snr_db=15, seed=1)
    res = build_pipeline_tpu(cfg)(x)
    r = np.sort(np.asarray(res.peak_angles["music"]), -1)
    assert np.abs(r[:, 0] - 61.43).max() < 0.15, r
    assert np.abs(r[:, 1] - 108.91).max() < 0.15, r
    assert "music" not in res.spectra  # hierarchical skips dense spectrum
