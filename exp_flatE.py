"""Covariance post-processing layout experiment (headline config).

The stacked cov kernel's Gram floor is 2.8 ms; the stage is 7.0 ms.
The gap is the (B, 32, 32) post-processing, which the TPU stores
4x lane-padded (268 MB/pass).  Candidates:

  planar   - current production: 4 batched basis einsums at tf32
  int_q    - interleaved basis, flips as pair-swap PERMUTATION einsums
             on the padded (B, 32, 32) layout (3 matmuls, no 5-D views)
  int_flat - interleaved basis on a FLAT (B, 8, 128) unpadded layout:
             flips become fixed 128-lane permutations (exact one-hot
             einsums), masks are elementwise; includes the relayout
             reshape from the kernel's (n*32, 32) output, and a final
             reshape back to (B, 32, 32) so downstream is unchanged
  int_flat_stay - same but WITHOUT the reshape back (bound for a full
             flat-layout integration)

All variants are checked for exactness vs the planar reference
(modulo the known basis map) before timing.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from doa_tpu.ops.pallas.cov_embedded import (
    _perm_interleaved_to_planar, cov_embedded_pallas, to_interleaved)

N, S, T = 16, 1024, 1 << 24
n2 = 2 * N
B = T // S


def _pair_swap_perm(n2):
    Q = np.zeros((n2, n2), np.float32)
    for k in range(n2):
        Q[k, k ^ 1] = 1.0
    return Q


def _flat_perm(pi_row, pi_col):
    """(i, j) -> (pi_row[i], pi_col[j]) as a 128-lane permutation of the
    flat (8, 128) view (sublane s=i>>2, lane 32*(i&3)+j) -- valid only
    when pi_row preserves i>>2."""
    P = np.zeros((128, 128), np.float32)
    for i in range(n2):
        assert pi_row[i] >> 2 == i >> 2
        for j in range(n2):
            src = 32 * (i & 3) + j
            dst = 32 * (pi_row[i] & 3) + pi_col[j]
            P[src, dst] += 0.0  # noop to keep mapping explicit
    for i in range(n2):
        for j in range(n2):
            # out[lane(dst)] = in[lane(src)] where (i,j) is the OUTPUT
            # index and the input index is (pi_row[i], pi_col[j])
            out_l = 32 * (i & 3) + j
            in_l = 32 * (pi_row[i] & 3) + pi_col[j]
            P[in_l, out_l] = 1.0
    return P


def make_inputs():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((T, N)) + 1j * rng.standard_normal((T, N))
         ).astype(np.complex64)
    corr = ((1.0 + 0.1 * rng.standard_normal(N))
            * np.exp(1j * rng.uniform(-0.3, 0.3, N))).astype(np.complex64)
    return x, corr


def chunk_grams(xil):
    """The raw kernel output path shared by all variants: (n, 32, 32)
    interleaved-basis chunk Grams (overlap=0 headline: n == B)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from doa_tpu.ops.pallas.cov_embedded import (_cov_kernel_uhat,
                                                 interleave_factor)
    tp = interleave_factor(N)
    hop = S
    # mirror cov_embedded_pallas stacked grid setup at overlap=0
    g = S
    n = T // g
    cb = 8
    rows_blk = g // tp
    Us = pl.pallas_call(
        functools.partial(_cov_kernel_uhat, N=N, hop=g, tp=tp, cb=cb,
                          compute_dtype=jnp.float32),
        grid=(n // cb,),
        in_specs=[pl.BlockSpec((cb * rows_blk, 2 * N * tp),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cb * n2, n2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * n2, n2), jnp.float32),
    )(xil)
    return Us.reshape(n, n2, n2)


def post_planar(U, Wre, Wim):
    Pm_np = _perm_interleaved_to_planar(N)
    Jp = np.zeros((n2, n2), np.float32)
    Jp[:N, N:] = -np.eye(N, dtype=np.float32)
    Jp[N:, :N] = np.eye(N, dtype=np.float32)
    M = jnp.asarray(Jp @ Pm_np)
    P = jnp.asarray(Pm_np)
    with jax.default_matmul_precision("tensorfloat32"):
        bmm = lambda a, b: jnp.einsum("bij,jk->bik", a, b,  # noqa: E731
                                      preferred_element_type=jnp.float32)
        lmm = lambda a, b: jnp.einsum("ij,bjk->bik", a, b,  # noqa: E731
                                      preferred_element_type=jnp.float32)
        E = (lmm(P, bmm(U, P.T)) + lmm(M, bmm(U, M.T))) * (1.0 / S)
        T1b = jnp.concatenate(
            [jnp.concatenate([Wre, Wre], axis=1)] * 2, axis=0)
        T2b = jnp.concatenate(
            [jnp.concatenate([-Wim, -Wim], axis=1),
             jnp.concatenate([Wim, Wim], axis=1)], axis=0)
        Esw = jnp.concatenate([E[:, N:, :], E[:, :N, :]], axis=1)
        E = E * T1b[None] + Esw * T2b[None]
    return E


def post_int_q(U, Wre, Wim):
    """Interleaved basis; flips via pair-swap permutation einsums."""
    Q = jnp.asarray(_pair_swap_perm(n2))
    sgn = jnp.asarray(np.kron(np.ones((N, N), np.float32),
                              np.array([[1, -1], [-1, 1]], np.float32)))
    one2 = np.ones((2, 2), np.float32)
    s2 = np.array([[-1, -1], [1, 1]], np.float32)
    M1 = jnp.asarray(np.kron(np.asarray(Wre), one2))
    M2 = jnp.asarray(np.kron(np.asarray(Wim), s2))
    with jax.default_matmul_precision("tensorfloat32"):
        bmm = lambda a, b: jnp.einsum("bij,jk->bik", a, b,  # noqa: E731
                                      preferred_element_type=jnp.float32)
        lmm = lambda a, b: jnp.einsum("ij,bjk->bik", a, b,  # noqa: E731
                                      preferred_element_type=jnp.float32)
        L = lmm(Q, U)                       # Q U
        LQ = bmm(L, Q)                      # Q U Q^T (Q symmetric)
        UQ = bmm(U, Q)                      # U Q^T
        # E1 = (U + (QUQ)*sgn)/S ; E = E1*M1 + (Q E1)*M2
        # Q E1 = (QU + (U Q)*(Q sgn))/S ; row-permuted sgn = sgn * (-1)?
        # (Q sgn)[i, j] = sgn[i^1, j] = -sgn[i, j]
        E = (U * M1 + LQ * (sgn * M1) + L * M2 - UQ * (sgn * M2)) * (1.0 / S)
    return E


def _flat_maps():
    idx = np.arange(n2)
    flip2 = _flat_perm(idx ^ 1, idx ^ 1)      # (i,j)->(i^1,j^1)
    f_row = _flat_perm(idx ^ 1, idx)          # (i,j)->(i^1,j)
    sgn = np.kron(np.ones((N, N), np.float32),
                  np.array([[1, -1], [-1, 1]], np.float32))
    return flip2, f_row, sgn


def _to_flat(t):    # (B, 32, 32) -> (B, 8, 128) row-major
    return t.reshape(t.shape[0], 8, 128)


def post_int_flat(U, Wre, Wim, stay_flat=False):
    """Interleaved basis on the flat (B, 8, 128) layout: flips are
    fixed 128-lane permutations (one-hot einsums -> exact at tf32)."""
    Pf2, Pfr, sgn_m = _flat_maps()
    one2 = np.ones((2, 2), np.float32)
    s2 = np.array([[-1, -1], [1, 1]], np.float32)
    M1 = np.kron(np.asarray(Wre), one2)
    M2 = np.kron(np.asarray(Wim), s2)
    sgn_f = jnp.asarray(_to_flat(sgn_m[None])[0])
    M1_f = jnp.asarray(_to_flat(M1[None])[0])
    M2_f = jnp.asarray(_to_flat(M2[None])[0])
    Uf = _to_flat(U)
    with jax.default_matmul_precision("tensorfloat32"):
        lane = lambda a, P: jnp.einsum(  # noqa: E731
            "bsl,lm->bsm", a, jnp.asarray(P),
            preferred_element_type=jnp.float32)
        # E1 = (U + flip2(U)*sgn)/S
        # E  = E1*M1 + frow(E1)*M2
        #    = [U*M1 + flip2(U)*sgn*M1 + frow(U)*M2 - fcol(U)*sgn*M2]/S
        # where frow(flip2(U)*sgn) = fcol(U) * frow(sgn) = -fcol(U)*sgn
        idx = np.arange(n2)
        Pfc = _flat_perm(idx, idx ^ 1)
        F2 = lane(Uf, Pf2)
        FR = lane(Uf, Pfr)
        FC = lane(Uf, Pfc)
        E = (Uf * M1_f + F2 * (sgn_f * M1_f) + FR * M2_f
             - FC * (sgn_f * M2_f)) * (1.0 / S)
    if stay_flat:
        return E
    return E.reshape(E.shape[0], n2, n2)


def check():
    """Exactness on a small problem (CPU-friendly shapes, real device)."""
    rng = np.random.default_rng(1)
    U = rng.standard_normal((4, n2, n2)).astype(np.float32)
    U = U + U.transpose(0, 2, 1)
    corr = ((1.0 + 0.1 * rng.standard_normal(N))
            * np.exp(1j * rng.uniform(-0.3, 0.3, N))).astype(np.complex64)
    Wre = corr.real[:, None] * corr.real[None] + \
        corr.imag[:, None] * corr.imag[None]
    Wim = corr.imag[:, None] * corr.real[None] - \
        corr.real[:, None] * corr.imag[None]
    Wre = jnp.asarray(Wre.astype(np.float32))
    Wim = jnp.asarray(Wim.astype(np.float32))
    Uj = jnp.asarray(U)
    E_pl = np.asarray(post_planar(Uj, Wre, Wim))
    P = _perm_interleaved_to_planar(N)
    want_int = np.einsum("ij,bjk,kl->bil", P.T, E_pl, P)
    got_q = np.asarray(post_int_q(Uj, Wre, Wim))
    got_f = np.asarray(post_int_flat(Uj, Wre, Wim))
    err_q = np.abs(got_q - want_int).max() / np.abs(want_int).max()
    err_f = np.abs(got_f - want_int).max() / np.abs(want_int).max()
    print(f"exactness: int_q rel={err_q:.2e}  int_flat rel={err_f:.2e}",
          flush=True)
    assert err_q < 1e-5 and err_f < 1e-5


def main():
    check()
    rng = np.random.default_rng(0)
    corr = ((1.0 + 0.1 * rng.standard_normal(N))
            * np.exp(1j * rng.uniform(-0.3, 0.3, N))).astype(np.complex64)
    xil = jax.random.normal(jax.random.key(0), (T // 4, 128), jnp.float32)
    Wre = (corr.real[:, None] * corr.real[None]
           + corr.imag[:, None] * corr.imag[None]).astype(np.float32)
    Wim = (corr.imag[:, None] * corr.real[None]
           - corr.real[:, None] * corr.imag[None]).astype(np.float32)
    Wre, Wim = jnp.asarray(Wre), jnp.asarray(Wim)

    grams = jax.jit(chunk_grams)

    def full(post, **kw):
        def f(xil):
            return post(grams(xil), Wre, Wim, **kw)
        return jax.jit(f)

    variants = {
        "gram_only": jax.jit(lambda z: chunk_grams(z)),
        "planar": full(post_planar),
        "int_q": full(post_int_q),
        "int_flat": full(post_int_flat),
        "int_flat_stay": full(post_int_flat, stay_flat=True),
    }
    for name, fn in variants.items():
        out = fn(xil)
        np.asarray(jax.device_get(out.ravel()[:1]))  # fence
        out = fn(xil)
        np.asarray(jax.device_get(out.ravel()[:1]))
        t0 = time.perf_counter()
        reps = 16
        for _ in range(reps):
            out = fn(xil)
        np.asarray(jax.device_get(out.ravel()[:1]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:14s} {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
