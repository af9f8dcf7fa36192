"""Pallas MUSIC scan kernel vs the jnp subspace scan (interpreter mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp

import golden
from doa_tpu.cpx import Cpx, embed_vector
from doa_tpu.ops import cpx_ops
from doa_tpu.ops.pallas import music_scan_pallas


def _setup(B_windows=8, N=16, G=721, K=2):
    x = golden.synthetic_ula_iq([60.0, 110.0], N, 0.5, B_windows * 2048,
                                snr_db=10, seed=3)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    A = golden.ula_steering(np.linspace(0, 180, G), N, 0.5).astype(
        np.complex64)
    Rc = Cpx.from_complex(R)
    Ac = Cpx.from_complex(A)
    V = cpx_ops.signal_subspace_embedded(Rc, K, iters=16)
    return V, Ac


def _check(P_pal, V, Ac, num_peaks=2):
    """Compare at denominator level (reciprocals amplify f32 noise
    unboundedly at the MUSIC nulls) + peak angles on normalized spectra."""
    den_ref = np.asarray(cpx_ops.music_denominator_subspace(V, Ac))
    den_pal = 1.0 / P_pal
    np.testing.assert_allclose(den_pal, den_ref, rtol=1e-3, atol=2e-3)
    from doa_tpu.ops.peaks import find_local_max
    import jax.numpy as jnp
    G = P_pal.shape[1]
    Pn_pal = P_pal / P_pal.max(-1, keepdims=True)
    P_ref = 1.0 / np.maximum(den_ref, np.finfo(np.float32).tiny)
    Pn_ref = P_ref / P_ref.max(-1, keepdims=True)
    _, l_pal = find_local_max(jnp.asarray(Pn_pal), num_peaks, 0.0, 180.0)
    _, l_ref = find_local_max(jnp.asarray(Pn_ref), num_peaks, 0.0, 180.0)
    np.testing.assert_allclose(np.sort(np.asarray(l_pal), -1),
                               np.sort(np.asarray(l_ref), -1), atol=0.3)


def test_pallas_scan_matches_jnp():
    V, Ac = _setup()
    At = embed_vector(Ac)
    P_pal = np.asarray(music_scan_pallas(V, At, interpret=True))
    assert P_pal.shape == (8, 721)
    _check(P_pal, V, Ac)


def test_pallas_scan_ragged_shapes():
    # B not a multiple of the lane pack, G not a multiple of 128.
    V, Ac = _setup(B_windows=5, G=333)
    At = embed_vector(Ac)
    P_pal = np.asarray(music_scan_pallas(V, At, interpret=True))
    assert P_pal.shape == (5, 333)
    _check(P_pal, V, Ac)


def test_pallas_cov_matches_golden():
    from doa_tpu.ops.pallas import cov_windows_pallas

    x = golden.synthetic_ula_iq([70.0], 8, 0.5, 8192, snr_db=10, seed=4)
    for S, O in [(512, 0), (512, 256)]:
        R_ref = golden.sample_covariance(golden.frame_samples(x, S, O))
        R_pal = cov_windows_pallas(Cpx.from_complex(x), S, O,
                                   interpret=True)
        np.testing.assert_allclose(R_pal.to_numpy(), R_ref, rtol=3e-4,
                                   atol=2e-5)


def _ref_peaks(V, Ac, k, refine):
    from doa_tpu.ops.peaks import find_local_max
    den = np.asarray(cpx_ops.music_denominator_subspace(V, Ac))
    P = 1.0 / np.maximum(den, np.finfo(np.float32).tiny)
    Pn = P / P.max(-1, keepdims=True)
    return find_local_max(jnp.asarray(Pn), k, 0.0, 180.0, refine=refine)


def test_fused_scan_peaks_matches_unfused():
    from doa_tpu.ops.pallas.music_scan import music_scan_peaks_pallas

    for refine in (False, True):
        V, Ac = _setup()
        At = embed_vector(Ac)
        v, l = music_scan_peaks_pallas(V, At, 2, 0.0, 180.0,
                                       refine=refine, interpret=True)
        v_ref, l_ref = _ref_peaks(V, Ac, 2, refine)
        assert v.shape == (8, 2) and l.shape == (8, 2)
        np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                                   atol=2e-3 if refine else 0.0)
        # peak VALUES sit at near-singular dens (catastrophic
        # cancellation in nrm - |Y|^2): ~1% relative noise is inherent
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=5e-2)


def test_fused_scan_peaks_ragged_and_k1():
    from doa_tpu.ops.pallas.music_scan import music_scan_peaks_pallas

    V, Ac = _setup(B_windows=5, G=333, K=2)
    At = embed_vector(Ac)
    v, l = music_scan_peaks_pallas(V, At, 1, 0.0, 180.0, refine=True,
                                   interpret=True)
    v_ref, l_ref = _ref_peaks(V, Ac, 1, True)
    assert v.shape == (5, 1)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=2e-3)


def test_fused_scan_peaks_pipeline_integration():
    """build_pipeline_tpu(return_spectra=False) on the pallas path must
    match the spectra-returning path's peaks (same kernel family)."""
    import dataclasses
    from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                                 GridSpec1D)
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=8,
                               norm_spacing=0.5),
        snapshot_size=512, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=721), num_max_vals=2,
        scan_mode="pallas", cov_impl="pallas")
    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16 * 512,
                                snr_db=10, seed=5).astype(np.complex64)
    full = build_pipeline_tpu(cfg)(x)
    lean = build_pipeline_tpu(cfg, return_spectra=False)(x)
    assert lean.spectra == {}
    assert "music" in full.spectra
    np.testing.assert_allclose(np.asarray(lean.peak_angles["music"]),
                               np.asarray(full.peak_angles["music"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(lean.peak_values["music"]),
                               np.asarray(full.peak_values["music"]),
                               rtol=5e-2)
