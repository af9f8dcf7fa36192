"""Parallel-Jacobi batched eigh: correctness vs jnp.linalg.eigh, and the
projector-without-sorting path used by the fast noise-subspace extraction."""

import numpy as np
import jax.numpy as jnp

import golden
from doa_tpu.cpx import Cpx, embed_hermitian, unembed_hermitian
from doa_tpu.ops.jacobi import eigh_jacobi, subspace_projector_jacobi


def _sym_batch(B, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


def test_eigvals_match_eigh():
    for n in (8, 16, 32):
        A = _sym_batch(16, n, seed=n)
        w_j, V_j = eigh_jacobi(jnp.asarray(A))
        w_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(w_j), w_ref, rtol=2e-4,
                                   atol=2e-4)


def test_eigvecs_diagonalize():
    A = _sym_batch(8, 32, seed=3)
    w, V = eigh_jacobi(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    recon = np.einsum("bmk,bk,bnk->bmn", V, w, V)
    np.testing.assert_allclose(recon, A, atol=5e-4)
    # orthonormality
    VtV = np.einsum("bmk,bml->bkl", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(32), VtV.shape),
                               atol=5e-4)


def test_projector_matches_sorted_eigh():
    A = _sym_batch(8, 32, seed=5)
    M = 12
    P_j = np.asarray(subspace_projector_jacobi(jnp.asarray(A), M))
    w, V = np.linalg.eigh(A)
    Vn = V[..., :M]
    P_ref = np.einsum("bmk,bnk->bmn", Vn, Vn)
    np.testing.assert_allclose(P_j, P_ref, atol=1e-3)


def test_noise_projector_via_jacobi_embedding():
    """End-to-end: Hermitian covariance → embedded Jacobi → complex noise
    projector must match the complex-eigh reference."""
    x = golden.synthetic_ula_iq([60.0, 110.0], 8, 0.5, 16384, snr_db=10,
                                seed=3)
    R = golden.sample_covariance(golden.frame_samples(x, 2048, 0))
    K = 2
    N = 8
    E = embed_hermitian(Cpx.from_complex(R))
    P_emb = subspace_projector_jacobi(E, 2 * (N - K))
    M_cpx = unembed_hermitian(np.asarray(P_emb))
    En = golden.noise_subspace(R, K)
    M_ref = np.einsum("bnm,bkm->bnk", En, En.conj())
    np.testing.assert_allclose(M_cpx.to_numpy(), M_ref, atol=2e-3)
