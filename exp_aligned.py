"""Eigen-aligned subspace schedule prototype (exp r2 s3).

Phase 1: one E apply from a shared random orthonormal init, long-NS orth
         (handles Gram cond spread^2 <= ~2^21).
Phase 2: Rayleigh-Ritz alignment: H = Vt E Vt^T (B, K2, K2), batched
         parallel-Jacobi eigh, rotate Vt <- U^T Vt. Once eigen-aligned,
         cross-eigendirection mixing is gone, so...
Phase 3: e2 sprint rounds with SHORT NS chains (Gram ~ diagonal at any
         spread; within-pair mixing is harmless - equal eigenvalues).

Measures time + planted-spectrum envelope vs the e1/e4 baselines.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from doa_tpu.cpx import f32_matmuls
from doa_tpu.ops.jacobi import _jacobi_raw

B, n2, K = 16384, 32, 2
K2 = 2 * K
PACK = 4


def make_E(spread, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n2, n2)).astype(np.float32)
    Q, _ = np.linalg.qr(A)
    sig = np.repeat(np.geomspace(spread, 1.0, K), 2).astype(np.float32)
    lam = np.concatenate([sig, np.full((n2 - K2,), noise, np.float32)])
    E = np.einsum("bik,k,bjk->bij", Q, lam, Q).astype(np.float32)
    return 0.5 * (E + np.swapaxes(E, -1, -2)), Q[..., :K2]


mask = jnp.asarray(np.kron(np.eye(PACK, dtype=np.float32),
                           np.ones((K2, K2), np.float32)))
eyeP = jnp.eye(PACK * K2, dtype=jnp.float32)
rng0 = np.random.default_rng(1234)
R0_host, _ = np.linalg.qr(rng0.standard_normal((n2, K2)).astype(np.float32))
R0 = jnp.asarray(R0_host.T)                      # (K2, n2) orthonormal rows


def mm(a, b):
    return jnp.einsum("bij,bjk->bik", a, b,
                      preferred_element_type=jnp.float32)


def orth(Vt, n_ns):
    Bp = Vt.shape[0]
    Vp = Vt.reshape(Bp // PACK, PACK * K2, n2)
    G = jnp.einsum("bkn,bln->bkl", Vp, Vp,
                   preferred_element_type=jnp.float32) * mask
    dg = jnp.sqrt(jnp.maximum(jnp.diagonal(G, axis1=-2, axis2=-1), 1e-30))
    G = G / dg[..., :, None] / dg[..., None, :]
    sq = jnp.sum(G * G, axis=-2)
    fro = jnp.sqrt(jnp.maximum(
        jnp.einsum("bk,kl->bl", sq, mask,
                   preferred_element_type=jnp.float32), 1e-30))
    Gn = G / fro[..., None, :]
    Y, Z = Gn, jnp.broadcast_to(eyeP, Gn.shape)
    for _ in range(n_ns):
        T = 1.5 * eyeP - 0.5 * mm(Z, Y)
        Y = mm(Y, T)
        Z = mm(T, Z)
    out = mm(Z, Vp / dg[..., :, None]) / jnp.sqrt(fro)[..., :, None]
    return out.reshape(Bp, K2, n2)


def aligned(E, sprint_sq=1, sprint_rounds=3, ns1=24, ns_s=4,
            jac_sweeps=6, realign=False):
    tr = jnp.einsum("bii->b", E)[:, None, None] / n2
    En = E / jnp.maximum(tr, 1e-30)
    # phase 1: one apply from the shared random init + long orth
    Vt = orth(jnp.einsum("kn,bnm->bkm", R0, En,
                         preferred_element_type=jnp.float32), ns1)

    def align(Vt):
        EVt = jnp.einsum("bkn,bnm->bkm", Vt, En,
                         preferred_element_type=jnp.float32)
        H = jnp.einsum("bkm,blm->bkl", EVt, Vt,
                       preferred_element_type=jnp.float32)  # (B, K2, K2)
        H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        _, U = _jacobi_raw(H, jac_sweeps)
        return jnp.einsum("bkj,bkn->bjn", U, Vt,
                          preferred_element_type=jnp.float32)

    Vt = align(Vt)
    Ep = En
    for _ in range(sprint_sq):
        Ep = mm(Ep, Ep)
    for r in range(sprint_rounds):
        Vt = orth(jnp.einsum("bkn,bnm->bkm", Vt, Ep,
                             preferred_element_type=jnp.float32), ns_s)
        if realign and r < sprint_rounds - 1:
            Vt = align(Vt)
    return Vt


VARIANTS = {
    "al_e2x3":  jax.jit(f32_matmuls(lambda E: aligned(E))),
    "al_e2x3r": jax.jit(f32_matmuls(lambda E: aligned(E, realign=True))),
    "al_e4x2":  jax.jit(f32_matmuls(
        lambda E: aligned(E, sprint_sq=2, sprint_rounds=2))),
}


def fence(x):
    np.asarray(jax.device_get(x.ravel()[:4]))


def proj_err(Vt, Vtrue):
    V = np.asarray(Vt).transpose(0, 2, 1)
    Pe = np.einsum("bik,bjk->bij", V, V)
    Pt = np.einsum("bik,bjk->bij", Vtrue, Vtrue)
    return np.linalg.norm((Pe - Pt).reshape(B, -1), axis=-1) / np.sqrt(K2)


def main():
    spreads = [2.0, 10.0, 30.0, 100.0, 300.0, 1000.0]
    data = {s: make_E(s) for s in spreads}
    E_dev = {s: jax.device_put(e) for s, (e, _) in data.items()}
    for s in spreads:
        fence(E_dev[s])
    print(f"B={B} n2={n2} K2={K2} (paired spectra)")
    for name, fn in VARIANTS.items():
        fence(fn(E_dev[spreads[0]]))
        fence(fn(E_dev[spreads[0]]))
        t0 = time.perf_counter()
        o = None
        for _ in range(16):
            o = fn(E_dev[spreads[0]])
        fence(o)
        dt = (time.perf_counter() - t0) / 16
        line = f"{name:10s} {dt * 1e3:6.2f} ms "
        for s in spreads:
            e = proj_err(np.asarray(fn(E_dev[s])), data[s][1])
            line += (f"| s={s:g}: p999={np.quantile(e, 0.999):.0e} "
                     f"bad={float((e > 0.1).mean()):.4f} ")
        print(line, flush=True)


if __name__ == "__main__":
    main()
