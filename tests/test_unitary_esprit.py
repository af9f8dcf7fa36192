"""Unitary (real-valued) ESPRIT: golden parity + implicit-FB + e2e.

Conventions pinned by tests/golden.py::{unitary_q, unitary_esprit}
(μ = −2·arctan(ω) under the pinned steering sign — verified against
synthetic truth before pinning)."""

import numpy as np
import jax.numpy as jnp
import pytest

import golden
from doa_tpu.configs import ArrayGeometry, DoaConfig, Estimator, GridSpec1D
from doa_tpu.cpx import Cpx


def _R(thetas, n=8, T=16384, snr=10, seed=3, S=512, **kw):
    x = golden.synthetic_ula_iq(thetas, n, 0.5, T, snr_db=snr, seed=seed,
                                **kw)
    return golden.sample_covariance(golden.frame_samples(x, S, 0)), x


def test_unitary_q_properties():
    for N in (4, 8, 9, 16):
        Q = golden.unitary_q(N)
        np.testing.assert_allclose(Q.conj().T @ Q, np.eye(N), atol=1e-12)
        # left-Π-real: Π Q = Q* (the defining centro-symmetry property)
        P = np.eye(N)[::-1]
        np.testing.assert_allclose(P @ Q, Q.conj(), atol=1e-12)


@pytest.mark.parametrize("N,thetas", [(8, [60.0, 110.0]),
                                      (9, [60.0, 110.0]),
                                      (16, [40.0, 75.0, 125.0])])
def test_unitary_esprit_golden_matches_truth(N, thetas):
    R, _ = _R(thetas, n=N)
    th = golden.unitary_esprit(R, len(thetas), 0.5)
    np.testing.assert_allclose(th.mean(0), thetas, atol=0.3)


@pytest.mark.parametrize("N", [8, 9, 16])
def test_unitary_esprit_op_matches_golden(N):
    from doa_tpu.ops.esprit import unitary_esprit_cpx

    thetas = [55.0, 105.0]
    R, _ = _R(thetas, n=N, snr=12, seed=5)
    th_g = golden.unitary_esprit(R, 2, 0.5)
    Rc = Cpx(jnp.asarray(R.real.astype(np.float32)),
             jnp.asarray(R.imag.astype(np.float32)))
    th_j = np.asarray(unitary_esprit_cpx(Rc, 2, 0.5))
    np.testing.assert_allclose(th_j, th_g, atol=0.1)


def test_unitary_esprit_implicit_fb_coherent_pair():
    """One fully-coherent pair resolves WITHOUT explicit FB averaging or
    smoothing — the real transform bakes FB in. (Plain ESPRIT on the
    same R collapses: rank-1 signal subspace.)"""
    from doa_tpu.ops.esprit import unitary_esprit_cpx

    R, _ = _R([60.0, 110.0], n=8, snr=15, correlated_pairs=[(0, 1)])
    Rc = Cpx(jnp.asarray(R.real.astype(np.float32)),
             jnp.asarray(R.imag.astype(np.float32)))
    th = np.asarray(unitary_esprit_cpx(Rc, 2, 0.5))
    np.testing.assert_allclose(th.mean(0), [60.0, 110.0], atol=0.5)


def test_unitary_esprit_in_both_pipelines():
    from doa_tpu.pipeline import build_pipeline
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=8,
                               norm_spacing=0.5),
        snapshot_size=512, num_sources=2,
        estimators=(Estimator.MUSIC, Estimator.UNITARY_ESPRIT),
        grid=GridSpec1D(num_points=361), num_max_vals=2)
    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384,
                                snr_db=10, seed=11).astype(np.complex64)
    for build in (build_pipeline, build_pipeline_tpu):
        res = build(cfg)(x)
        assert res.unitary_esprit_angles is not None
        got = np.sort(np.asarray(res.unitary_esprit_angles), -1).mean(0)
        np.testing.assert_allclose(got, [60.0, 110.0], atol=0.5,
                                   err_msg=build.__name__)
