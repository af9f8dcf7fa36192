"""Sanity checks on the golden numpy reference itself: the golden math must
localize known sources before it can serve as a parity target."""

import numpy as np

import golden


def test_music_localizes_single_tone():
    theta_true = 72.0
    x = golden.synthetic_ula_iq([theta_true], 4, 0.5, 4096, snr_db=10, seed=3)
    frames = golden.frame_samples(x, 256, 0)
    R = golden.sample_covariance(frames)
    grid = np.linspace(0, 180, 1441)
    A = golden.ula_steering(grid, 4, 0.5)
    P = golden.music_spectrum(R, A, num_sources=1)
    est = grid[np.argmax(P, axis=-1)]
    assert np.all(np.abs(est - theta_true) < 0.5), est


def test_music_two_sources():
    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384, snr_db=10, seed=5)
    frames = golden.frame_samples(x, 2048, 0)
    R = golden.sample_covariance(frames)
    grid = np.linspace(0, 180, 1441)
    A = golden.ula_steering(grid, 8, 0.5)
    P = golden.music_spectrum(R, A, num_sources=2)
    vals, locs = golden.find_local_max(P, 2, 0.0, 180.0)
    locs = np.sort(locs, axis=-1)
    assert np.all(np.abs(locs[:, 0] - 60.0) < 1.0), locs
    assert np.all(np.abs(locs[:, 1] - 110.0) < 1.0), locs


def test_capon_two_sources():
    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384, snr_db=10, seed=5)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    grid = np.linspace(0, 180, 1441)
    A = golden.ula_steering(grid, 8, 0.5)
    P = golden.capon_spectrum(R, A, diag_load=1e-4)
    _, locs = golden.find_local_max(P, 2, 0.0, 180.0)
    locs = np.sort(locs, axis=-1)
    assert np.all(np.abs(locs[:, 0] - 60.0) < 1.5), locs
    assert np.all(np.abs(locs[:, 1] - 110.0) < 1.5), locs


def test_root_music_matches_truth():
    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384, snr_db=15, seed=7)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    theta = golden.root_music(R, 2, 0.5)
    assert np.all(np.abs(theta[:, 0] - 60.0) < 0.5), theta
    assert np.all(np.abs(theta[:, 1] - 110.0) < 0.5), theta


def test_fb_average_decorrelates():
    # A fully correlated pair defeats plain MUSIC; FB averaging + smoothing
    # must recover both angles.
    x = golden.synthetic_ula_iq(
        [70.0, 100.0], 16, 0.5, 32768, snr_db=15, seed=11,
        correlated_pairs=[(0, 1)],
    )
    R = golden.sample_covariance(golden.frame_samples(x, 4096, 0),
                                 fb_average=True)
    Rs = golden.spatial_smooth(R, 12)
    grid = np.linspace(0, 180, 1441)
    A = golden.ula_steering(grid, 12, 0.5)
    P = golden.music_spectrum(Rs, A, num_sources=2)
    _, locs = golden.find_local_max(P, 2, 0.0, 180.0)
    locs = np.sort(locs, axis=-1)
    assert np.all(np.abs(locs[:, 0] - 70.0) < 2.0), locs
    assert np.all(np.abs(locs[:, 1] - 100.0) < 2.0), locs


def test_calibration_roundtrip():
    # Impaired channels -> pilot calibration recovers corrections that undo
    # the impairment (up to common scale).
    N = 8
    rng = np.random.default_rng(2)
    gains = 1.0 + 0.3 * rng.standard_normal(N)
    phases = rng.uniform(-0.5, 0.5, N)
    pilot = 90.0
    x = golden.synthetic_ula_iq([pilot], N, 0.5, 8192, snr_db=30, seed=2)
    imp = x * (gains * np.exp(1j * phases))[None, :]
    R = golden.sample_covariance(golden.frame_samples(imp, 1024, 0))
    c = golden.element_calibration(R.mean(axis=0), pilot, 0.5)
    fixed = golden.apply_antenna_correction(imp, c)
    # After correction, the array response to the pilot should match ideal
    # steering: check via MUSIC peak at the pilot angle.
    Rf = golden.sample_covariance(golden.frame_samples(fixed, 1024, 0))
    grid = np.linspace(0, 180, 1441)
    A = golden.ula_steering(grid, N, 0.5)
    P = golden.music_spectrum(Rf, A, num_sources=1)
    est = grid[np.argmax(P, axis=-1)]
    assert np.all(np.abs(est - pilot) < 0.5), est


def test_phase_offset_roundtrip():
    N = 4
    phases = np.array([0.0, 0.7, -1.1, 2.0])
    # Common tone into all channels (cable-split): steering = all-ones
    # (theta=90 broadside gives cos=0 -> a=1), then per-chain phase offsets.
    x = golden.synthetic_ula_iq([90.0], N, 0.5, 4096, snr_db=30, seed=4)
    imp = golden.apply_phase_correction(x, -phases)  # inject +phases
    est = golden.phase_offset_est(imp)
    err = np.angle(np.exp(1j * (est - (phases - phases[0]))))
    assert np.all(np.abs(err) < 0.02), (est, phases)
