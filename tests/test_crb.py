"""Cramér-Rao bound module: closed-form pins, derivative checks, and a
Monte-Carlo statistical-efficiency check of the grid-free estimator
against the bound (the quantitative form of BASELINE's RMSE metric)."""

import numpy as np
import pytest

from doa_tpu.configs import ArrayGeometry, DoaConfig, Estimator, GridSpec1D
from doa_tpu.io import SourceSpec, synth_ula_iq
from doa_tpu.ops.crb import (
    _ula_a_d,
    _ura_a_d,
    crb_single_source_ula_closed_form,
    crb_ula_deg,
    crb_ura_deg,
)
from doa_tpu.pipeline_tpu import build_pipeline_tpu


def test_single_source_matches_closed_form():
    got = crb_ula_deg([70.0], 8, 0.5, snr_db=10.0, n_snapshots=256,
                      kind="deterministic")
    want = crb_single_source_ula_closed_form(70.0, 8, 0.5, 10.0, 256)
    assert got.shape == (1,)
    np.testing.assert_allclose(got[0], want, rtol=1e-10)


def test_stochastic_at_least_deterministic():
    for theta in ([70.0], [60.0, 110.0], [85.0, 95.0]):
        sto = crb_ula_deg(theta, 8, 0.5, 5.0, 128, kind="stochastic")
        det = crb_ula_deg(theta, 8, 0.5, 5.0, 128, kind="deterministic")
        assert np.all(sto >= det * (1 - 1e-12)), (theta, sto, det)


def test_scaling_laws():
    base = crb_ula_deg([60.0, 110.0], 8, 0.5, 10.0, 256)
    # variance ~ 1/n: std halves when snapshots quadruple
    quad = crb_ula_deg([60.0, 110.0], 8, 0.5, 10.0, 1024)
    np.testing.assert_allclose(quad, base / 2, rtol=0.02)
    # monotone improvements with SNR and aperture
    assert np.all(crb_ula_deg([60.0, 110.0], 8, 0.5, 20.0, 256) < base)
    assert np.all(crb_ula_deg([60.0, 110.0], 16, 0.5, 10.0, 256) < base)
    # closely spaced sources are strictly harder
    close = crb_ula_deg([88.0, 92.0], 8, 0.5, 10.0, 256)
    assert np.all(close > base)


def test_coherent_sources_harder_than_uncorrelated():
    theta = [80.0, 100.0]
    unc = crb_ula_deg(theta, 8, 0.5, 10.0, 256)
    coh = crb_ula_deg(theta, 8, 0.5, 10.0, 256,
                      correlation=np.ones((2, 2), complex))
    assert np.all(coh > unc)


@pytest.mark.parametrize("theta", [[40.0], [60.0, 110.0]])
def test_ula_derivative_matches_finite_difference(theta):
    h = 1e-6
    _, D = _ula_a_d(theta, 8, 0.5)
    Ap, _ = _ula_a_d(np.rad2deg(np.deg2rad(theta) + h), 8, 0.5)
    Am, _ = _ula_a_d(np.rad2deg(np.deg2rad(theta) - h), 8, 0.5)
    np.testing.assert_allclose(D, (Ap - Am) / (2 * h), rtol=0, atol=5e-4)


def test_ura_derivative_matches_finite_difference():
    az, el = np.array([20.0, -35.0]), np.array([30.0, 55.0])
    h = 1e-6
    _, D = _ura_a_d(az, el, (4, 4), 0.5)
    K = az.size
    for p, (daz, del_) in enumerate([(h, 0.0), (0.0, h)]):
        Ap, _ = _ura_a_d(np.rad2deg(np.deg2rad(az) + daz),
                         np.rad2deg(np.deg2rad(el) + del_), (4, 4), 0.5)
        Am, _ = _ura_a_d(np.rad2deg(np.deg2rad(az) - daz),
                         np.rad2deg(np.deg2rad(el) - del_), (4, 4), 0.5)
        np.testing.assert_allclose(D[:, p * K:(p + 1) * K],
                                   (Ap - Am) / (2 * h), rtol=0, atol=5e-4)


def test_ura_crb_shape_and_symmetry():
    # one source at az=0 on a square array: x/y apertures match, so the
    # az and el bounds at el=45 relate by the u-space Jacobians, and
    # everything must be finite and positive
    out = crb_ura_deg([10.0, -25.0], [30.0, 50.0], (4, 4), 0.5,
                      snr_db=10.0, n_snapshots=256)
    assert out.shape == (2, 2)
    assert np.all(np.isfinite(out)) and np.all(out > 0)
    # more snapshots → smaller bound, elementwise
    out4 = crb_ura_deg([10.0, -25.0], [30.0, 50.0], (4, 4), 0.5,
                       snr_db=10.0, n_snapshots=1024)
    assert np.all(out4 < out)


def test_root_music_efficiency_near_crb():
    """Grid-free root-MUSIC at high SNR should sit within a small factor
    of the stochastic CRB — the end-to-end statistical-efficiency check
    (grid-scan estimators are bin-quantized and can't make this claim)."""
    N, S, W = 8, 512, 24
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=N,
                               norm_spacing=0.5),
        snapshot_size=S, num_sources=1,
        estimators=(Estimator.MUSIC, Estimator.ROOT_MUSIC),
        grid=GridSpec1D(num_points=256), num_max_vals=1)
    pipe = build_pipeline_tpu(cfg)
    truth = 70.0
    errs = []
    for seed in range(3):
        x = synth_ula_iq([SourceSpec(theta_deg=truth, freq_norm=0.07)],
                         N, 0.5, W * S, snr_db=20.0, seed=seed)
        rm = np.asarray(pipe(x).root_music_angles)
        errs.append(rm[:, 0] - truth)
    rmse = float(np.sqrt(np.mean(np.concatenate(errs) ** 2)))
    crb = float(crb_ula_deg([truth], N, 0.5, 20.0, S)[0])
    # unbiased + near-efficient: within [0.5x, 5x] of the bound
    assert 0.5 * crb < rmse < 5.0 * crb, (rmse, crb)


def test_eval_reports_crb_column():
    from doa_tpu.eval import evaluate_ula
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=8,
                               norm_spacing=0.5),
        snapshot_size=256, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=512), num_max_vals=2)
    rows = evaluate_ula(cfg, [60.0, 110.0], snrs_db=[10.0], trials=1,
                        windows_per_trial=4, seed=1)
    assert rows and all(np.isfinite(r.crb_deg) and r.crb_deg > 0
                        for r in rows)
    # the estimator can't beat the bound by much (grid bias aside, give
    # a loose statistical margin)
    for r in rows:
        assert r.rmse_deg > 0.3 * r.crb_deg
