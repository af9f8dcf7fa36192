"""Native C++ ingest framer: correctness vs numpy (skips to the numpy
fallback automatically if no toolchain)."""

import numpy as np

from doa_tpu.io.native import frame_block, merge_c64, split_c64


def _x(T=4096, N=8, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((T, N))
            + 1j * rng.standard_normal((T, N))).astype(np.complex64)


def test_split_roundtrip():
    x = _x()
    re, im = split_c64(x)
    assert re.dtype == np.float32 and re.shape == x.shape
    np.testing.assert_array_equal(re, x.real)
    np.testing.assert_array_equal(im, x.imag)
    np.testing.assert_array_equal(merge_c64(re, im), x)


def test_frame_block_with_tail():
    x = _x()
    tail = _x(256, 8, seed=1)
    re, im = frame_block(tail, x)
    assert re.shape == (4096 + 256, 8)
    np.testing.assert_array_equal(re[:256], tail.real)
    np.testing.assert_array_equal(im[256:], x.imag)


def test_frame_block_no_tail():
    x = _x(1024, 4)
    re, im = frame_block(None, x)
    np.testing.assert_array_equal(re, x.real)
    np.testing.assert_array_equal(im, x.imag)


def test_bf16_scan_close_to_f32():
    import jax.numpy as jnp
    import golden
    from doa_tpu.cpx import Cpx
    from doa_tpu.ops import cpx_ops

    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384, snr_db=10,
                                seed=3)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    A = golden.ula_steering(np.linspace(0, 180, 721), 8, 0.5)
    M = cpx_ops.noise_projector_cpx(Cpx.from_complex(R), 2)
    Ac = Cpx.from_complex(A.astype(np.complex64))
    den32 = np.asarray(cpx_ops.music_denominator_cpx(M, Ac))
    den16 = np.asarray(cpx_ops.music_denominator_cpx(
        M, Ac, compute_dtype=jnp.bfloat16))
    # bf16 has ~3 decimal digits; denominators are O(1)..O(N)
    assert np.max(np.abs(den16 - den32)) < 0.15
    # peak locations must agree
    from doa_tpu.ops.peaks import find_local_max
    P32 = 1.0 / np.maximum(den32, 1e-30)
    P16 = 1.0 / np.maximum(den16, 1e-30)
    _, l32 = find_local_max(jnp.asarray(P32), 2, 0.0, 180.0)
    _, l16 = find_local_max(jnp.asarray(P16), 2, 0.0, 180.0)
    np.testing.assert_allclose(np.sort(np.asarray(l16), -1),
                               np.sort(np.asarray(l32), -1), atol=0.5)


def test_int8_scan_peaks_survive():
    import jax.numpy as jnp
    import golden
    from doa_tpu.cpx import Cpx
    from doa_tpu.ops import cpx_ops
    from doa_tpu.ops.peaks import find_local_max

    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384, snr_db=10,
                                seed=3)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    A = golden.ula_steering(np.linspace(0, 180, 721), 8, 0.5)
    Rc = Cpx.from_complex(R)
    Ac = Cpx.from_complex(A.astype(np.complex64))
    V = cpx_ops.signal_subspace_embedded(Rc, 2, iters=16)
    den32 = np.asarray(cpx_ops.music_denominator_subspace(V, Ac))
    den8 = np.asarray(cpx_ops.music_denominator_subspace(
        V, Ac, compute_dtype=jnp.int8))
    # int8 is a COARSE mode: quantization noise (~0.1) fills the deep
    # nulls, so verify peak NEIGHBORHOODS: every true angle has an int8
    # local max within 1.5°, and the coarse spectrum tracks f32 globally.
    assert np.abs(den8 - den32).max() < 0.2, np.abs(den8 - den32).max()
    P8 = 1.0 / np.maximum(den8, 1e-2)
    _, locs = find_local_max(jnp.asarray(P8), 4, 0.0, 180.0)
    locs = np.asarray(locs)
    for truth in (60.0, 110.0):
        assert np.abs(locs - truth).min(axis=-1).max() < 1.5, locs
