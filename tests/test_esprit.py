"""ESPRIT estimator: accuracy vs truth and vs root-MUSIC, including the
complex power-iteration signal basis and the eig-free eigenvalue path."""

import numpy as np

import golden
from doa_tpu.cpx import Cpx
from doa_tpu.ops.esprit import esprit_cpx, signal_subspace_cpx


def _R(thetas, N=8, T=16384, snr=15, seed=7):
    x = golden.synthetic_ula_iq(thetas, N, 0.5, T, snr_db=snr, seed=seed)
    return golden.sample_covariance(golden.frame_samples(x, 2048, 0))


def test_complex_signal_subspace_is_signal_span():
    R = _R([60.0, 110.0])
    Es = signal_subspace_cpx(Cpx.from_complex(R), 2)
    E = Es.to_numpy()                    # (B, N, 2)
    # orthonormal
    G = np.einsum("bnk,bnl->bkl", E.conj(), E)
    np.testing.assert_allclose(G, np.broadcast_to(np.eye(2), G.shape),
                               atol=2e-3)
    # projector parity vs eigh signal subspace
    w, v = np.linalg.eigh(R)
    Vs = v[..., -2:]
    P_ref = np.einsum("bnk,bmk->bnm", Vs, Vs.conj())
    P_got = np.einsum("bnk,bmk->bnm", E, E.conj())
    np.testing.assert_allclose(P_got, P_ref, atol=5e-3)


def test_esprit_two_sources():
    R = _R([60.0, 110.0])
    theta = np.asarray(esprit_cpx(Cpx.from_complex(R), 2, 0.5))
    assert np.abs(theta[:, 0] - 60.0).max() < 0.5, theta
    assert np.abs(theta[:, 1] - 110.0).max() < 0.5, theta


def test_esprit_three_sources_16el():
    truths = [40.0, 75.0, 120.0]
    R = _R(truths, N=16, T=32768, snr=15)
    theta = np.asarray(esprit_cpx(Cpx.from_complex(R), 3, 0.5))
    for i, t in enumerate(truths):
        assert np.abs(theta[:, i] - t).max() < 0.5, theta


def test_esprit_close_to_root_music():
    from doa_tpu.ops.root_music import root_music_cpx

    R = _R([65.7, 104.2], snr=20)
    Rc = Cpx.from_complex(R)
    t_e = np.asarray(esprit_cpx(Rc, 2, 0.5))
    t_r = np.asarray(root_music_cpx(Rc, 2, 0.5))
    np.testing.assert_allclose(t_e, t_r, atol=0.2)


def test_esprit_in_pipeline():
    import dataclasses

    from doa_tpu import PRESETS
    from doa_tpu.configs import Estimator
    from doa_tpu.io import SourceSpec, synth_ula_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = dataclasses.replace(
        PRESETS["c2_ula8_2src"],
        estimators=(Estimator.MUSIC, Estimator.ESPRIT))
    x = synth_ula_iq(
        [SourceSpec(theta_deg=60.0, freq_norm=0.1),
         SourceSpec(theta_deg=110.0, freq_norm=0.31)],
        8, 0.5, 8 * 2048, snr_db=15, seed=1)
    res = build_pipeline_tpu(cfg)(x)
    e = np.asarray(res.esprit_angles)
    assert np.abs(e[:, 0] - 60.0).max() < 0.5, e
    assert np.abs(e[:, 1] - 110.0).max() < 0.5, e


def test_eval_harness_rmse():
    import dataclasses

    from doa_tpu import PRESETS
    from doa_tpu.configs import Estimator
    from doa_tpu.eval import evaluate_ula

    cfg = dataclasses.replace(
        PRESETS["c2_ula8_2src"],
        estimators=(Estimator.MUSIC, Estimator.ROOT_MUSIC))
    results = evaluate_ula(cfg, [60.0, 110.0], snrs_db=[10.0], trials=2,
                           windows_per_trial=4)
    by_est = {r.estimator: r for r in results}
    # BASELINE bound: ≤0.5° at 10 dB SNR.
    assert by_est["music"].rmse_deg < 0.5, by_est["music"]
    assert by_est["music"].resolve_prob == 1.0
    assert by_est["root_music"].rmse_deg < 0.5, by_est["root_music"]


def test_esprit_2d_recovers_az_el():
    """2-D LS-ESPRIT on a URA: paired az/el, grid-free."""
    from doa_tpu.ops.esprit import esprit_2d_cpx
    from doa_tpu.io.synthetic import SourceSpec, synth_ura_iq

    shape = (4, 4)
    x = synth_ura_iq(
        [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.1),
         SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.3)],
        shape, 0.5, 16 * 1024, snr_db=15, seed=5)
    R = golden.sample_covariance(golden.frame_samples(x, 1024, 0))
    az, el = esprit_2d_cpx(Cpx.from_complex(R), 2, 0.5, shape)
    az_m, el_m = np.asarray(az).mean(0), np.asarray(el).mean(0)
    # sorted by az: [-20, 35]; pairing must hold el = [30, 60]
    np.testing.assert_allclose(az_m, [-20.0, 35.0], atol=0.3)
    np.testing.assert_allclose(el_m, [30.0, 60.0], atol=0.3)


def test_esprit_2d_three_sources_pairing():
    """K=3 with distinct x-cosines: pairing via Cayley-Hamilton
    eigenvectors + Rayleigh quotients must keep (az, el) together."""
    from doa_tpu.ops.esprit import esprit_2d_cpx
    from doa_tpu.io.synthetic import SourceSpec, synth_ura_iq

    shape = (6, 6)
    truth = [(-40.0, 20.0), (5.0, 55.0), (50.0, 35.0)]
    x = synth_ura_iq(
        [SourceSpec(az_deg=a, el_deg=e, freq_norm=0.08 + 0.09 * i)
         for i, (a, e) in enumerate(truth)],
        shape, 0.5, 24 * 1024, snr_db=15, seed=6)
    R = golden.sample_covariance(golden.frame_samples(x, 1024, 0))
    az, el = esprit_2d_cpx(Cpx.from_complex(R), 3, 0.5, shape)
    az_m, el_m = np.asarray(az).mean(0), np.asarray(el).mean(0)
    np.testing.assert_allclose(az_m, [-40.0, 5.0, 50.0], atol=0.5)
    np.testing.assert_allclose(el_m, [20.0, 55.0, 35.0], atol=0.5)


def test_esprit_2d_pipeline_integration():
    """Estimator.ESPRIT on a ura config produces (B, K, 2) az/el."""
    from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                                 GridSpec2D)
    from doa_tpu.io.synthetic import SourceSpec, synth_ura_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ura", num_elements=16,
                               norm_spacing=0.5, shape=(4, 4)),
        snapshot_size=512, num_sources=2,
        estimators=(Estimator.MUSIC, Estimator.ESPRIT),
        grid2d=GridSpec2D(num_az=61, num_el=31), num_max_vals=2)
    x = synth_ura_iq(
        [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.1),
         SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.3)],
        (4, 4), 0.5, 8 * 512, snr_db=15, seed=7).astype(np.complex64)
    res = build_pipeline_tpu(cfg)(x)
    ang = np.asarray(res.esprit_angles)
    assert ang.shape == (8, 2, 2)
    med = np.median(ang, axis=0)
    np.testing.assert_allclose(med[:, 0], [-20.0, 35.0], atol=1.0)
    np.testing.assert_allclose(med[:, 1], [30.0, 60.0], atol=1.0)
