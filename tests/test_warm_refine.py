"""Parity tests for the fused warm-refine subspace kernel.

The kernel (ops/pallas/warm_refine.py) must reproduce the XLA
warm-start refinement (cpx_ops._subspace_E_T_mgs with init) exactly:
same MGS ordering, same 2-pass final round, same escalation detector
(eigengap ratio γ + invariance residual). Run in interpret mode on the
8-virtual-device CPU backend (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doa_tpu.ops import cpx_ops
from doa_tpu.ops.pallas.warm_refine import (
    warm_refine_escalated, warm_refine_packed_pallas)


def _random_psd(rng, B, n2, floor=3.0):
    A = rng.standard_normal((B, n2, n2)).astype(np.float32)
    return jnp.asarray(
        A @ np.swapaxes(A, 1, 2) / n2
        + floor * np.eye(n2, dtype=np.float32))


def _xla_warm(E, K, iters):
    Vt_bar = cpx_ops.signal_subspace_from_E_T(
        jnp.mean(E, axis=0)[None], K, iters=8)
    init = jnp.broadcast_to(Vt_bar, (E.shape[0],) + Vt_bar.shape[1:])
    return Vt_bar, cpx_ops.signal_subspace_from_E_T(
        E, K, iters=iters, init=init)


@pytest.mark.parametrize("B,N,K", [(70, 16, 2), (40, 8, 1), (33, 4, 2)])
def test_warm_refine_matches_xla(B, N, K):
    rng = np.random.default_rng(0)
    n2, k2 = 2 * N, 2 * K
    E = _random_psd(rng, B, n2)
    Vt_bar, Vt_ref = _xla_warm(E, K, iters=3)
    Vp, gamma, res, _ = warm_refine_packed_pallas(
        E, Vt_bar[0], iters=3, interpret=True)
    Vt_k = Vp.reshape(-1, k2, n2)[:B]
    np.testing.assert_allclose(np.asarray(Vt_k), np.asarray(Vt_ref),
                               atol=2e-5)


def test_warm_refine_detector_matches_xla():
    rng = np.random.default_rng(1)
    B, N, K = 70, 16, 2
    n2, k2 = 2 * N, 2 * K
    E = _random_psd(rng, B, n2)
    Vt_bar, _ = _xla_warm(E, K, iters=3)
    init = jnp.broadcast_to(Vt_bar, (B,) + Vt_bar.shape[1:])
    # reference detector quantities (cpx_ops._subspace_E_T_mgs body)
    tr = jnp.einsum("bii->b", E)[:, None, None] / n2
    Ep = E / tr
    Vt = init
    for r in range(3):
        W = jnp.einsum("bkn,bnm->bkm", Vt, Ep)
        Vt_prev = Vt
        Vt = cpx_ops._mgs_rows(W, passes=2 if r == 2 else 1)
    lam = jnp.sum(W * Vt_prev, axis=-1)
    noise = jnp.maximum((n2 - jnp.sum(lam, -1)) / (n2 - k2), 1e-30)
    gamma_ref = jnp.min(lam, -1) / noise
    gmax_ref = jnp.max(lam, -1) / noise
    C = jnp.einsum("bkm,blm->bkl", W, Vt_prev)
    resid = W - jnp.einsum("bkl,blm->bkm", C, Vt_prev)
    res_ref = (jnp.sqrt(jnp.sum(resid ** 2, (-2, -1)))
               / jnp.maximum(jnp.sqrt(jnp.sum(W ** 2, (-2, -1))), 1e-30))
    _, gamma, res, gmax = warm_refine_packed_pallas(
        E, Vt_bar[0], iters=3, interpret=True)
    np.testing.assert_allclose(np.asarray(gamma[:B]),
                               np.asarray(gamma_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res[:B]),
                               np.asarray(res_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gmax[:B]),
                               np.asarray(gmax_ref), rtol=1e-4)
    # the cpx_ops detector computes the same three quantities
    g2, gm2, r2 = cpx_ops.escalation_detector(W, Vt_prev, n2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(gamma_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm2), np.asarray(gmax_ref),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(res_ref),
                               atol=1e-6)


def test_warm_refine_escalated_matches_xla_escalation():
    """A planted hard spectrum (tiny eigengap) must flag and escalate
    to the same subspace the XLA escalation path produces."""
    rng = np.random.default_rng(2)
    B, N, K = 40, 8, 2
    n2, k2 = 2 * N, 2 * K
    # planted: strong pair + one near-noise signal eigenvalue
    Q, _ = np.linalg.qr(rng.standard_normal((n2, n2)).astype(np.float32))
    lams = np.ones(n2, np.float32) * 0.1
    lams[:2] = 100.0
    lams[2:4] = 0.14          # γ ≈ 1.4 → flags
    E = jnp.asarray(np.broadcast_to(
        (Q * lams) @ Q.T, (B, n2, n2)).astype(np.float32))
    Vt_bar = cpx_ops.signal_subspace_from_E_T(
        jnp.mean(E, axis=0)[None], K, iters=8)
    init = jnp.broadcast_to(Vt_bar, (B,) + Vt_bar.shape[1:])
    kw = dict(escalate_extra=40, escalate_gap=3.0, escalate_tol=0.05)
    Vt_ref = cpx_ops.signal_subspace_from_E_T(
        E, K, iters=3, init=init, **kw)
    Vp = warm_refine_escalated(E, Vt_bar[0], iters=3, interpret=True,
                               **kw)
    Vt_k = Vp.reshape(-1, k2, n2)[:B]
    P_ref = jnp.einsum("bkn,bkm->bnm", Vt_ref, Vt_ref)
    P_k = jnp.einsum("bkn,bkm->bnm", Vt_k, Vt_k)
    assert float(jnp.max(jnp.abs(P_k - P_ref))) < 1e-4


def test_warm_refine_per_subband_inits():
    """Wideband EP form: a subband-major merged stack with per-subband
    warm inits must match the XLA per-subband refinement."""
    rng = np.random.default_rng(4)
    F, Bsub, N, K = 2, 64, 8, 2
    n2, k2 = 2 * N, 2 * K
    E = jnp.stack([_random_psd(rng, Bsub, n2, floor=1.0 + f)
                   for f in range(F)])               # (F, Bsub, n2, n2)
    Vt_bar = cpx_ops.signal_subspace_from_E_T(
        jnp.mean(E, axis=1), K, iters=8)             # (F, k2, n2)
    init = jnp.broadcast_to(
        Vt_bar[:, None], (F, Bsub, k2, n2)).reshape(F * Bsub, k2, n2)
    Vt_ref = cpx_ops.signal_subspace_from_E_T(
        E.reshape(F * Bsub, n2, n2), K, iters=3, init=init)
    Vp, _, _, _ = warm_refine_packed_pallas(
        E.reshape(F * Bsub, n2, n2), Vt_bar, iters=3, interpret=True)
    Vt_k = Vp.reshape(-1, k2, n2)[:F * Bsub]
    np.testing.assert_allclose(np.asarray(Vt_k), np.asarray(Vt_ref),
                               atol=2e-5)


def test_pipeline_fused_vs_forced_xla_subspace(monkeypatch):
    """End-to-end: subspace_impl='fused' (the warm-refine kernel)
    matches subspace_impl='xla' on the same capture — and the fused
    pipeline MUST actually invoke the kernel (r3 ADVICE: the fused
    dispatch branch was unreachable and this test passed for the wrong
    reason; the counter pins the integration)."""
    import dataclasses

    import doa_tpu.ops.pallas.warm_refine as wr
    from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                                 GridSpec1D)
    from doa_tpu.pipeline_tpu import build_pipeline_tpu
    from tests import golden

    calls = []
    real = wr.warm_refine_escalated
    monkeypatch.setattr(
        wr, "warm_refine_escalated",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=8,
                               norm_spacing=0.5),
        snapshot_size=256, overlap=0, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=360), num_max_vals=2,
        cov_impl="pallas", scan_mode="pallas")
    x = golden.synthetic_ula_iq([70.0, 120.0], 8, 0.5, 40 * 256,
                                snr_db=10.0, seed=3)
    out_fused = build_pipeline_tpu(
        dataclasses.replace(cfg, subspace_impl="fused"),
        return_spectra=False)(x)
    assert calls, "fused pipeline never invoked the warm-refine kernel"
    cfg_xla = dataclasses.replace(cfg, subspace_impl="xla")
    out_xla = build_pipeline_tpu(cfg_xla, return_spectra=False)(x)
    a_f = np.sort(np.asarray(out_fused.peak_angles["music"]), axis=-1)
    a_x = np.sort(np.asarray(out_xla.peak_angles["music"]), axis=-1)
    np.testing.assert_allclose(a_f, a_x, atol=0.05)
