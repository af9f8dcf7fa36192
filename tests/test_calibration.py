"""Calibration subsystem tests: parity vs golden + full two-stage roundtrip
(the reference's stage-1/stage-2 procedure, SURVEY §3.3/3.4)."""

import numpy as np
import jax.numpy as jnp

import golden
from doa_tpu import calib, ops
from doa_tpu.io import SourceSpec, synth_ula_iq
from doa_tpu.pipeline import build_pipeline
from doa_tpu import PRESETS


def test_phase_offset_parity():
    x = golden.synthetic_ula_iq([90.0], 4, 0.5, 4096, snr_db=20, seed=1)
    phases = np.array([0.0, 0.5, -0.9, 1.7])
    imp = golden.apply_phase_correction(x, -phases)
    g = golden.phase_offset_est(imp)
    j = np.asarray(calib.phase_offset_est(jnp.asarray(imp)))
    err = np.angle(np.exp(1j * (j - g)))
    assert np.abs(err).max() < 1e-4


def test_element_calibration_parity():
    N = 8
    x = golden.synthetic_ula_iq([75.0], N, 0.5, 8192, snr_db=25, seed=2)
    R = golden.sample_covariance(golden.frame_samples(x, 1024, 0))
    g = golden.element_calibration(R.mean(axis=0), 75.0, 0.5)
    j = np.asarray(calib.element_calibration(
        jnp.asarray(R.mean(axis=0)[None]), 75.0, 0.5))[0]
    np.testing.assert_allclose(j, g, rtol=1e-3, atol=1e-4)


def test_two_stage_roundtrip_with_artifact(tmp_path):
    """Full reference procedure: inject chain phases + element impairments,
    run stage 1 (common tone), stage 2 (pilot), persist, reload, estimate."""
    N = 8
    rng = np.random.default_rng(3)
    chain_phases = rng.uniform(-1.5, 1.5, N)
    chain_phases[0] = 0.0
    elem_gains = 1.0 + 0.25 * rng.standard_normal(N)
    elem_phases = rng.uniform(-0.4, 0.4, N)

    def impair(x):
        x = golden.apply_phase_correction(x, -chain_phases)  # chain phases
        return x * (elem_gains * np.exp(1j * elem_phases))[None, :]

    # Stage 1: common tone into all chains (no array response): theta=90
    # broadside gives a == 1 for a ULA.
    x_common = synth_ula_iq([SourceSpec(theta_deg=90.0)], N, 0.5, 8192,
                            snr_db=25, seed=4)
    phi = np.asarray(calib.phase_offset_est(jnp.asarray(impair(x_common))))

    # Stage 2: pilot at a known angle, after stage-1 correction.
    pilot = 68.0
    x_pilot = synth_ula_iq([SourceSpec(theta_deg=pilot)], N, 0.5, 16384,
                           snr_db=25, seed=5)
    xp = impair(x_pilot) * np.exp(-1j * phi)[None, :]
    R = ops.sample_covariance(ops.frame_samples(jnp.asarray(xp), 2048, 0))
    c_b = calib.element_calibration(R, pilot, 0.5)
    from doa_tpu.calib.element_cal import average_corrections
    c_elem = np.asarray(average_corrections(c_b))

    # Persist + reload.
    art = calib.CalibrationArtifact(
        phase_offsets=phi, element_corrections=c_elem, num_elements=N,
        norm_spacing=0.5, pilot_theta_deg=pilot)
    path = str(tmp_path / "cal.npz")
    calib.save_calibration(path, art)
    art2 = calib.load_calibration(path)
    corr = art2.correction_vector()

    # Apply to an impaired capture of an unknown source; DoA must be right.
    theta_true = 113.0
    x_t = synth_ula_iq([SourceSpec(theta_deg=theta_true)], N, 0.5, 16384,
                       snr_db=15, seed=6)
    cfg = PRESETS["c1_ula4_tone"]
    import dataclasses
    cfg = dataclasses.replace(
        cfg, geometry=dataclasses.replace(cfg.geometry, num_elements=N),
        snapshot_size=2048)
    res = build_pipeline(cfg)(impair(x_t), correction=corr)
    est = np.asarray(res.peak_angles["music"])
    assert np.abs(est - theta_true).mean() < 0.5, est.mean()


def test_compose_corrections():
    a = np.exp(1j * np.array([0.1, 0.2])).astype(np.complex64)
    b = np.array([2.0, 0.5], dtype=np.complex64)
    c = np.asarray(calib.compose_corrections(a, b))
    np.testing.assert_allclose(c, a * b, rtol=1e-6)
