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


def test_hierarchical_2d_ura():
    from doa_tpu.configs import GridSpec2D
    from doa_tpu.io import SourceSpec, synth_ura_iq
    from doa_tpu.ops.hierarchical import music_hierarchical_ura
    from doa_tpu.ops.steering import ura_grid
    from doa_tpu.configs import ArrayGeometry

    truths = [(-29.37, 21.52), (41.18, 54.77)]
    geo = ArrayGeometry(kind="ura", num_elements=64, norm_spacing=0.5,
                        shape=(8, 8))
    x = synth_ura_iq(
        [SourceSpec(az_deg=truths[0][0], el_deg=truths[0][1],
                    freq_norm=0.1),
         SourceSpec(az_deg=truths[1][0], el_deg=truths[1][1],
                    freq_norm=0.3)],
        (8, 8), 0.5, 8 * 1024, snr_db=15, seed=0)
    R = golden.sample_covariance(golden.frame_samples(x, 1024, 0))
    V = cpx_ops.signal_subspace_embedded(Cpx.from_complex(R), 2, iters=16)
    # coarse grid: 4 degrees spacing
    g2 = GridSpec2D(num_az=46, num_el=24, az_lo_deg=-90, az_hi_deg=90,
                    el_lo_deg=0, el_hi_deg=90)
    A = Cpx.from_complex(ura_grid(geo, g2).astype(np.complex64))
    vals, az, el = music_hierarchical_ura(V, A, 2, (8, 8), 0.5, g2)
    az, el = np.asarray(az), np.asarray(el)
    for b in range(az.shape[0]):
        for k in range(2):
            d = min(np.hypot(az[b, k] - t[0], el[b, k] - t[1])
                    for t in truths)
            assert d < 0.5, (az[b], el[b])


def test_pipeline_hierarchical_2d():
    import dataclasses
    from doa_tpu.configs import (
        ArrayGeometry, DoaConfig, Estimator, GridSpec2D)
    from doa_tpu.io import SourceSpec, synth_ura_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ura", num_elements=64,
                               norm_spacing=0.5, shape=(8, 8)),
        snapshot_size=1024, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid2d=GridSpec2D(num_az=46, num_el=24, az_lo_deg=-90,
                          az_hi_deg=90, el_lo_deg=0, el_hi_deg=90),
        num_max_vals=2, scan_mode="hierarchical")
    truths = [(-29.37, 21.52), (41.18, 54.77)]
    x = synth_ura_iq(
        [SourceSpec(az_deg=truths[0][0], el_deg=truths[0][1],
                    freq_norm=0.1),
         SourceSpec(az_deg=truths[1][0], el_deg=truths[1][1],
                    freq_norm=0.3)],
        (8, 8), 0.5, 8 * 1024, snr_db=15, seed=0)
    res = build_pipeline_tpu(cfg)(x)
    ang = np.asarray(res.peak_angles["music"])  # (B, 2, 2)
    for b in range(ang.shape[0]):
        for k in range(2):
            d = min(np.hypot(ang[b, k, 0] - t[0], ang[b, k, 1] - t[1])
                    for t in truths)
            assert d < 0.5, ang[b]


def test_capon_hierarchical_ula_accuracy():
    import dataclasses
    from doa_tpu.configs import Estimator
    from doa_tpu.io import SourceSpec, synth_ula_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu
    from doa_tpu import PRESETS

    cfg = dataclasses.replace(
        PRESETS["c2_ula8_2src"], estimators=(Estimator.CAPON,),
        scan_mode="hierarchical")
    x = synth_ula_iq([SourceSpec(theta_deg=61.3, freq_norm=0.1),
                      SourceSpec(theta_deg=112.6, freq_norm=0.31)],
                     8, 0.5, 16 * 2048, snr_db=15, seed=2)
    res = build_pipeline_tpu(cfg)(x)
    a = np.sort(np.asarray(res.peak_angles["capon"]), -1)
    np.testing.assert_allclose(a.mean(0), [61.3, 112.6], atol=0.25)


def test_wideband_hierarchical_ula_accuracy():
    import dataclasses
    from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                                 GridSpec1D, WidebandSpec)
    from doa_tpu.io import SourceSpec
    from doa_tpu.io.synthetic import synth_wideband_ula_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = DoaConfig(
        geometry=ArrayGeometry("ula", 16, 0.5),
        snapshot_size=1024, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=256),
        wideband=WidebandSpec(num_subbands=8, fractional_bw=0.1),
        num_max_vals=2, scan_mode="hierarchical")
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=58.7, freq_norm=0.0, bandwidth_norm=0.6),
         SourceSpec(theta_deg=121.4, freq_norm=0.0, bandwidth_norm=0.6)],
        16, 0.5, 32 * 1024, snr_db=15, seed=3, fractional_bw=0.1)
    dense = build_pipeline_tpu(dataclasses.replace(
        cfg, scan_mode="dense"))(x)
    hier = build_pipeline_tpu(cfg)(x)
    a_d = np.sort(np.asarray(dense.peak_angles["music"]), -1).mean(0)
    a_h = np.sort(np.asarray(hier.peak_angles["music"]), -1).mean(0)
    np.testing.assert_allclose(a_h, [58.7, 121.4], atol=0.5)
    # refinement must not be worse than the coarse dense grid
    err_d = np.abs(a_d - [58.7, 121.4]).max()
    err_h = np.abs(a_h - [58.7, 121.4]).max()
    assert err_h <= err_d + 0.05
