"""Coherent wideband fusion (CSSM with unitary RSS focusing).

Reference has no wideband support at all (gr-doa is narrowband-only,
SURVEY §0); BASELINE config 5 mandates subband channelization + fusion.
`fusion="cssm"` is the coherent alternative to the incoherent spectrum
mean: focused covariances feed the FULL narrowband estimator suite
(Capon, root-MUSIC/ESPRIT — grid-free wideband DoA).
"""

import dataclasses

import numpy as np

import golden
from doa_tpu.configs import (
    ArrayGeometry, DoaConfig, Estimator, GridSpec2D, WidebandSpec)
from doa_tpu.cpx import Cpx
from doa_tpu.io import SourceSpec
from doa_tpu.io.synthetic import synth_wideband_ula_iq, synth_wideband_ura_iq
from doa_tpu.ops.wideband import (
    cssm_covariance_cpx, dft_matrix, focusing_matrices, subband_spacings)
from doa_tpu.pipeline_tpu import build_pipeline_tpu


def _wb_cfg(**over):
    base = dict(
        geometry=ArrayGeometry(kind="ula", num_elements=16,
                               norm_spacing=0.5),
        snapshot_size=1024,
        num_sources=2,
        estimators=(Estimator.MUSIC,),
        wideband=WidebandSpec(num_subbands=16, fractional_bw=0.4,
                              fusion="cssm"),
        num_max_vals=2,
    )
    base.update(over)
    return DoaConfig(**base)


def test_focusing_matrices_unitary_and_aligning():
    cfg = _wb_cfg()
    T = focusing_matrices(cfg)                       # (F, N, N) c64
    N = cfg.geometry.num_elements
    eye = np.eye(N)
    for f in range(T.shape[0]):
        np.testing.assert_allclose(T[f].conj().T @ T[f], eye, atol=2e-5)
    # focusing must shrink the manifold misalignment on the SCAN grid
    # (not just at the focusing directions)
    from doa_tpu.ops.steering import _ula_steering_np
    theta = np.linspace(20.0, 160.0, 57)
    B0 = _ula_steering_np(theta, N, cfg.geometry.norm_spacing).T  # (N, G)
    for f, d in enumerate(subband_spacings(cfg)):
        if abs(float(d) - cfg.geometry.norm_spacing) < 1e-9:
            continue                                  # center subband
        Bf = _ula_steering_np(theta, N, float(d)).T
        before = np.linalg.norm(B0 - Bf)
        after = np.linalg.norm(B0 - T[f] @ Bf)
        # J = 2N default: every subband's grid misalignment at least
        # halves (measured max ratio 0.46 on this scenario)
        assert after < 0.55 * before, (f, float(d), before, after)


def test_cssm_covariance_golden_parity():
    """Device CSSM covariance vs a from-scratch numpy reference."""
    cfg = _wb_cfg(snapshot_size=256,
                  wideband=WidebandSpec(num_subbands=8, fractional_bw=0.2,
                                        fusion="cssm"))
    rng = np.random.default_rng(0)
    N = cfg.geometry.num_elements
    F = cfg.wideband.num_subbands
    T_samp = 4 * cfg.snapshot_size
    x = (rng.standard_normal((T_samp, N))
         + 1j * rng.standard_normal((T_samp, N))).astype(np.complex64)

    W = dft_matrix(F)
    T_foc = focusing_matrices(cfg)
    got = cssm_covariance_cpx(
        Cpx.from_complex(x), Cpx.from_complex(W), Cpx.from_complex(T_foc),
        cfg).to_numpy()

    # numpy reference: frame-DFT channelizer → per-subband windowed
    # covariance (subband snapshot = S // F) → focused mean.
    M = T_samp // F
    xf = x[: M * F].reshape(M, F, N)
    xs = np.einsum("ft,mtn->fmn", W, xf)             # (F, M, N)
    S_sub = cfg.snapshot_size // F
    want = None
    for f in range(F):
        frames = golden.frame_samples(xs[f], S_sub, 0)
        Rf = golden.sample_covariance(frames)        # (B, N, N)
        foc = np.einsum("nm,bmk,pk->bnp", T_foc[f], Rf, T_foc[f].conj())
        want = foc if want is None else want + foc
    want /= F
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_cssm_resolves_wideband_sources():
    cfg = _wb_cfg()
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=65.0, freq_norm=0.0, bandwidth_norm=0.5),
         SourceSpec(theta_deg=115.0, freq_norm=0.0, bandwidth_norm=0.5)],
        16, 0.5, 16 * 1024, fractional_bw=0.4, snr_db=10, seed=1)
    res = build_pipeline_tpu(cfg)(x)
    locs = np.sort(np.asarray(res.peak_angles["music"]), axis=-1)
    med = np.median(locs, axis=0)
    assert abs(med[0] - 65.0) < 2.0, med
    assert abs(med[1] - 115.0) < 2.0, med


def test_cssm_grid_free_wideband_root_music_and_esprit():
    """Coherent fusion unlocks GRID-FREE wideband DoA: the focused
    covariance feeds root-MUSIC and ESPRIT directly (impossible with
    spectrum-level incoherent fusion)."""
    cfg = _wb_cfg(estimators=(Estimator.MUSIC, Estimator.ROOT_MUSIC,
                              Estimator.ESPRIT))
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=70.0, freq_norm=0.0, bandwidth_norm=0.4),
         SourceSpec(theta_deg=120.0, freq_norm=0.0, bandwidth_norm=0.4)],
        16, 0.5, 16 * 1024, fractional_bw=0.4, snr_db=10, seed=2)
    res = build_pipeline_tpu(cfg)(x)
    for angles in (res.root_music_angles, res.esprit_angles):
        a = np.sort(np.median(np.asarray(angles), axis=0))
        assert abs(a[0] - 70.0) < 2.0, a
        assert abs(a[1] - 120.0) < 2.0, a


def test_cssm_low_snr_tracks_incoherent_scenario():
    """Coherent averaging across the band keeps working at an SNR where
    the per-subband SNR is deep in the threshold region."""
    cfg = _wb_cfg()
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=60.0, freq_norm=0.0, bandwidth_norm=0.5),
         SourceSpec(theta_deg=110.0, freq_norm=0.0, bandwidth_norm=0.5)],
        16, 0.5, 32 * 1024, fractional_bw=0.4, snr_db=-5, seed=3)
    res = build_pipeline_tpu(cfg)(x)
    locs = np.sort(np.asarray(res.peak_angles["music"]), axis=-1)
    med = np.median(locs, axis=0)
    assert abs(med[0] - 60.0) < 2.5, med
    assert abs(med[1] - 110.0) < 2.5, med


def test_cssm_2d_planar_wideband():
    """CSSM on the c5-shaped planar wideband scenario (2-D az/el)."""
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ura", num_elements=64,
                               norm_spacing=0.5, shape=(8, 8)),
        snapshot_size=512,
        num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid2d=GridSpec2D(num_az=61, num_el=31),
        wideband=WidebandSpec(num_subbands=8, fractional_bw=0.1,
                              fusion="cssm"),
        num_max_vals=2,
    )
    truth = [(-20.0, 30.0), (35.0, 60.0)]
    x = synth_wideband_ura_iq(
        [SourceSpec(az_deg=truth[0][0], el_deg=truth[0][1], freq_norm=0.05,
                    bandwidth_norm=0.2),
         SourceSpec(az_deg=truth[1][0], el_deg=truth[1][1], freq_norm=0.25,
                    bandwidth_norm=0.2)],
        (8, 8), 0.5, 16 * 512, fractional_bw=0.1, snr_db=10, seed=4)
    res = build_pipeline_tpu(cfg)(x)
    ang = np.asarray(res.peak_angles["music"])       # (B, k, 2)
    order = np.argsort(ang[..., 0], axis=-1)
    ang = np.take_along_axis(ang, order[..., None], 1)
    med = np.median(ang, axis=0)
    for k in range(2):
        d = np.hypot(med[k, 0] - truth[k][0], med[k, 1] - truth[k][1])
        assert d < 2.5, med


def test_cssm_config_validation():
    import pytest

    with pytest.raises(ValueError, match="fusion"):
        _wb_cfg(wideband=WidebandSpec(num_subbands=8, fusion="bogus"))


# ---------------------------------------------------------------------
# Two-pass AUTO-FOCUSED CSSM (fusion="cssm_auto")
# ---------------------------------------------------------------------

def test_polar_unitary_matches_svd():
    """Device Newton-Schulz polar factor vs the numpy SVD polar
    T = U Vᴴ (well-conditioned batch pins the convention exactly)."""
    from doa_tpu.ops.wideband import polar_unitary_cpx

    rng = np.random.default_rng(3)
    N, F = 16, 6
    M = (rng.standard_normal((F, N, N))
         + 1j * rng.standard_normal((F, N, N))).astype(np.complex64)
    M = M + 3.0 * np.eye(N)           # well-conditioned, far from rank-def
    T = polar_unitary_cpx(Cpx.from_complex(M)).to_numpy()
    eye = np.eye(N)
    for f in range(F):
        U, _, Vh = np.linalg.svd(M[f])
        np.testing.assert_allclose(T[f].conj().T @ T[f], eye, atol=5e-4)
        np.testing.assert_allclose(T[f], U @ Vh, atol=5e-4)


def test_device_ula_steering_matches_golden():
    from doa_tpu.ops.wideband import device_ula_steering_cpx
    import jax.numpy as jnp

    th = np.array([40.0, 91.5, 133.0], np.float32)
    got = device_ula_steering_cpx(jnp.asarray(th), 8,
                                  np.array([0.5, 0.61], np.float32))
    got = got.to_numpy()
    for s, d in enumerate((0.5, 0.61)):
        want = golden.ula_steering(th, 8, d)
        np.testing.assert_allclose(got[s], want, atol=2e-5)


def test_auto_focus_beats_or_matches_static_at_large_fbw():
    """fractional_bw 0.55 — past the static J=2N set's tested envelope.
    The runtime-focused fit must stay within tolerance of truth and not
    lose to the static set."""
    fbw = 0.55
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=70.0, freq_norm=0.0, bandwidth_norm=0.5),
         SourceSpec(theta_deg=115.0, freq_norm=0.0, bandwidth_norm=0.5)],
        16, 0.5, 16 * 1024, fractional_bw=fbw, snr_db=10, seed=4)

    def err(fusion):
        cfg = _wb_cfg(wideband=WidebandSpec(
            num_subbands=16, fractional_bw=fbw, fusion=fusion))
        res = build_pipeline_tpu(cfg)(x)
        med = np.median(np.sort(
            np.asarray(res.peak_angles["music"]), -1), axis=0)
        return np.abs(med - np.array([70.0, 115.0])).max()

    e_auto, e_static = err("cssm_auto"), err("cssm")
    assert e_auto < 1.0, (e_auto, e_static)
    assert e_auto <= e_static + 0.1, (e_auto, e_static)


def test_cssm_auto_ura_2d():
    """Planar auto-focus: 2-D coarse pass → runtime URA steering →
    NS polar — config-5-shaped scenario at fractional bw 0.4."""
    from doa_tpu.configs import GridSpec2D

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ura", num_elements=64,
                               shape=(8, 8), norm_spacing=0.5),
        snapshot_size=1024, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid2d=GridSpec2D(num_az=61, az_lo_deg=-60.0, az_hi_deg=60.0,
                          num_el=31, el_lo_deg=10.0, el_hi_deg=80.0),
        wideband=WidebandSpec(num_subbands=8, fractional_bw=0.4,
                              fusion="cssm_auto"),
        num_max_vals=2)
    x = synth_wideband_ura_iq(
        [SourceSpec(theta_deg=0.0, az_deg=-20.0, el_deg=30.0,
                    freq_norm=0.0, bandwidth_norm=0.4),
         SourceSpec(theta_deg=0.0, az_deg=35.0, el_deg=60.0,
                    freq_norm=0.0, bandwidth_norm=0.4)],
        (8, 8), 0.5, 16 * 1024, fractional_bw=0.4, snr_db=10, seed=5)
    res = build_pipeline_tpu(cfg)(x)
    got = np.asarray(res.peak_angles["music"])       # (B, k, 2) az/el
    med = np.median(got, axis=0)
    med = med[np.argsort(med[:, 0])]
    np.testing.assert_allclose(med[0], [-20.0, 30.0], atol=2.0)
    np.testing.assert_allclose(med[1], [35.0, 60.0], atol=2.0)


def test_cssm_auto_ura_requires_grid2d():
    import pytest

    with pytest.raises(ValueError, match="grid2d"):
        DoaConfig(
            geometry=ArrayGeometry(kind="ura", num_elements=16,
                                   shape=(4, 4), norm_spacing=0.5),
            snapshot_size=256, num_sources=2,
            wideband=WidebandSpec(num_subbands=8, fusion="cssm_auto"))
