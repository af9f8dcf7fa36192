"""AIC/MDL source-count estimation."""

import numpy as np
import pytest

import golden
from doa_tpu.cpx import Cpx
from doa_tpu.ops.model_order import estimate_num_sources, eigenvalues_cpx


def _R(thetas, N=8, S=2048, snr=10, seed=0):
    x = golden.synthetic_ula_iq(thetas, N, 0.5, 8 * S, snr_db=snr,
                                seed=seed)
    return golden.sample_covariance(golden.frame_samples(x, S, 0)), S


def test_eigenvalues_match_numpy():
    R, _ = _R([60.0, 110.0])
    w = np.asarray(eigenvalues_cpx(Cpx.from_complex(R)))
    w_ref = np.linalg.eigvalsh(R)
    np.testing.assert_allclose(w, w_ref, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("truth", [1, 2, 3])
def test_mdl_detects_source_count(truth):
    thetas = [50.0, 90.0, 130.0][:truth]
    R, S = _R(thetas, N=8, snr=10, seed=truth)
    K = np.asarray(estimate_num_sources(Cpx.from_complex(R), S))
    assert (K == truth).mean() >= 0.9, (truth, K)


def test_aic_ge_mdl():
    R, S = _R([60.0, 110.0], snr=5, seed=9)
    Rc = Cpx.from_complex(R)
    k_mdl = np.asarray(estimate_num_sources(Rc, S, "mdl"))
    k_aic = np.asarray(estimate_num_sources(Rc, S, "aic"))
    assert (k_aic >= k_mdl).all()
