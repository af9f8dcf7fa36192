"""End-to-end integration tests: BASELINE configs as runnable pipelines with
quantitative angle-error assertions (improving on the reference's by-eye
simulation check, SURVEY §4)."""

import numpy as np
import pytest

from doa_tpu import PRESETS
from doa_tpu.configs import DoaConfig, Estimator
from doa_tpu.io import SourceSpec, synth_ula_iq
from doa_tpu.pipeline import build_pipeline


def test_config1_single_tone_music():
    cfg = PRESETS["c1_ula4_tone"]
    theta = 72.3
    x = synth_ula_iq([SourceSpec(theta_deg=theta)], 4, 0.5, 64 * 256,
                     snr_db=10, seed=0)
    res = build_pipeline(cfg)(x)
    est = np.asarray(res.peak_angles["music"])
    assert est.shape == (64, 1)
    # BASELINE: ≤0.5° at 10 dB SNR.
    assert np.abs(est - theta).mean() < 0.5, est.mean()


def test_config2_two_sources_music_capon():
    cfg = PRESETS["c2_ula8_2src"]
    x = synth_ula_iq(
        [SourceSpec(theta_deg=60.0, freq_norm=0.1),
         SourceSpec(theta_deg=110.0, freq_norm=0.31)],
        8, 0.5, 8 * 2048, snr_db=10, seed=1)
    res = build_pipeline(cfg)(x)
    for est_name in ("music", "capon"):
        locs = np.sort(np.asarray(res.peak_angles[est_name]), axis=-1)
        assert np.abs(locs[:, 0] - 60.0).max() < 1.0, (est_name, locs)
        assert np.abs(locs[:, 1] - 110.0).max() < 1.0, (est_name, locs)


def test_config3_correlated_pair_smoothing():
    cfg = PRESETS["c3_ula16_calib_smooth"]
    x = synth_ula_iq(
        [SourceSpec(theta_deg=70.0, freq_norm=0.1),
         SourceSpec(theta_deg=100.0, freq_norm=0.1),   # coherent with 0
         SourceSpec(theta_deg=40.0, freq_norm=0.33)],
        16, 0.5, 16 * 1024, snr_db=15, seed=2,
        correlated_pairs=[(0, 1)])
    res = build_pipeline(cfg)(x)
    locs = np.sort(np.asarray(res.peak_angles["music"]), axis=-1)
    med = np.median(locs, axis=0)
    assert np.abs(med - np.array([40.0, 70.0, 100.0])).max() < 2.0, med


def test_config4_overlap_streaming_windows():
    cfg = PRESETS["c4_ula16_streaming"]
    x = synth_ula_iq(
        [SourceSpec(theta_deg=55.0), SourceSpec(theta_deg=125.0,
                                                freq_norm=0.3)],
        16, 0.5, 16384, snr_db=10, seed=3)
    res = build_pipeline(cfg)(x)
    B_expected = (16384 - 1024) // 512 + 1
    locs = np.sort(np.asarray(res.peak_angles["music"]), axis=-1)
    assert locs.shape == (B_expected, 2)
    assert np.abs(locs[:, 0] - 55.0).max() < 1.0
    assert np.abs(locs[:, 1] - 125.0).max() < 1.0


def test_root_music_estimator_in_pipeline():
    cfg = DoaConfig(
        geometry=PRESETS["c2_ula8_2src"].geometry,
        snapshot_size=2048, num_sources=2,
        estimators=(Estimator.MUSIC, Estimator.ROOT_MUSIC),
        num_max_vals=2)
    x = synth_ula_iq(
        [SourceSpec(theta_deg=60.0), SourceSpec(theta_deg=110.0,
                                                freq_norm=0.3)],
        8, 0.5, 8 * 2048, snr_db=15, seed=4)
    res = build_pipeline(cfg)(x)
    rm = np.asarray(res.root_music_angles)
    assert np.abs(rm[:, 0] - 60.0).max() < 0.5, rm
    assert np.abs(rm[:, 1] - 110.0).max() < 0.5, rm


def test_pipeline_with_correction_vector():
    # Impaired channels + the correct calibration vector → accurate DoA.
    cfg = PRESETS["c1_ula4_tone"]
    rng = np.random.default_rng(7)
    gains = 1.0 + 0.3 * rng.standard_normal(4)
    phases = rng.uniform(-0.8, 0.8, 4)
    imp = gains * np.exp(1j * phases)
    x = synth_ula_iq([SourceSpec(theta_deg=64.0)], 4, 0.5, 32 * 256,
                     snr_db=15, seed=5, channel_gains=gains,
                     channel_phases=phases)
    res_bad = build_pipeline(cfg)(x)
    res_fix = build_pipeline(cfg)(x, correction=(1.0 / imp).astype(np.complex64))
    err_fix = np.abs(np.asarray(res_fix.peak_angles["music"]) - 64.0).mean()
    assert err_fix < 0.5, err_fix
    # (the impaired run may or may not be badly off; just ensure corrected
    #  is no worse)
    err_bad = np.abs(np.asarray(res_bad.peak_angles["music"]) - 64.0).mean()
    assert err_fix <= err_bad + 0.1
