"""Scratch experiment: subspace-stage variants on hardware.

Times signal_subspace_from_E_T-style schedules at the headline shape
(B=16384, n2=32, K=2) with pipelined fencing, and checks projector
accuracy vs an exact host eigh on a planted spectrum.

Variants:
  a_iters16   current production: E4 squaring, rounds=4, cubic NS 12/8
  b_iters8    rounds=2 (8 effective power iterations)
  c_quintic16 rounds=4, quintic coupled NS (7 final / 5 mid)
  d_quintic8  rounds=2, quintic NS
  e_e8_one    E8 (3 squarings), ONE orth round (8 effective iters)

Run: python exp_subspace.py [spread]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from doa_tpu.cpx import f32_matmuls  # noqa: E402


B, n2, K = 16384, 32, 2
K2 = 2 * K
PACK = 4


def make_E(spread=10.0, noise=0.02, seed=0):
    """Planted-spectrum symmetric E (host): K signal eigenvalues
    geometric from `spread` down to 1.0, each DUPLICATED (embedded
    complex Hermitian matrices have paired spectra), rest noise."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n2, n2)).astype(np.float32)
    Q, _ = np.linalg.qr(A)
    sig = np.repeat(np.geomspace(spread, 1.0, K), 2).astype(np.float32)
    lam = np.concatenate([sig, np.full((n2 - K2,), noise, np.float32)])
    E = np.einsum("bik,k,bjk->bij", Q, lam, Q).astype(np.float32)
    E = 0.5 * (E + np.swapaxes(E, -1, -2))
    Vtrue = Q[..., :K2]  # exact signal subspace
    return E, Vtrue


def _orth_factory(ns_kind):
    """Returns orthonormalize(Vt, n_ns) on packed (Bp, K2, n2)."""
    mask = jnp.asarray(np.kron(np.eye(PACK, dtype=np.float32),
                               np.ones((K2, K2), np.float32)))
    eyeP = jnp.eye(PACK * K2, dtype=jnp.float32)

    def mm(a, b):
        return jnp.einsum("bij,bjk->bik", a, b,
                          preferred_element_type=jnp.float32)

    def orthonormalize(Vt, n_ns):
        Bp = Vt.shape[0]
        Vp = Vt.reshape(Bp // PACK, PACK * K2, n2)
        G = jnp.einsum("bkn,bln->bkl", Vp, Vp,
                       preferred_element_type=jnp.float32) * mask
        dg = jnp.sqrt(jnp.maximum(
            jnp.diagonal(G, axis1=-2, axis2=-1), 1e-30))
        G = G / dg[..., :, None] / dg[..., None, :]
        sq = jnp.sum(G * G, axis=-2)
        fro = jnp.sqrt(jnp.maximum(
            jnp.einsum("bk,kl->bl", sq, mask,
                       preferred_element_type=jnp.float32), 1e-30))
        Gn = G / fro[..., None, :]
        Y, Z = Gn, jnp.broadcast_to(eyeP, Gn.shape)
        if ns_kind == "cubic":
            for _ in range(n_ns):
                T = 0.5 * (3.0 * eyeP - mm(Z, Y))
                Y = mm(Y, T)
                Z = mm(T, Z)
        else:  # quintic coupled (order-3 Pade family)
            for _ in range(n_ns):
                M = mm(Z, Y)
                T = (15.0 * eyeP - 10.0 * M + 3.0 * mm(M, M)) / 8.0
                Y = mm(Y, T)
                Z = mm(T, Z)
        out = mm(Z, Vp / dg[..., :, None]) / jnp.sqrt(fro)[..., :, None]
        return out.reshape(Bp, K2, n2)

    return orthonormalize, mm


def make_variant(rounds, ns_kind, ns_final, ns_mid, squarings=2):
    orth, mm = _orth_factory(ns_kind)

    def fn(E):
        tr = jnp.einsum("bii->b", E)[:, None, None] / n2
        Ep = E / jnp.maximum(tr, 1e-30)
        for _ in range(squarings):
            Ep = mm(Ep, Ep)
        Vt = orth(Ep[..., :K2, :], ns_final)
        for r in range(rounds - 1):
            Vt = orth(
                jnp.einsum("bkn,bnm->bkm", Vt, Ep,
                           preferred_element_type=jnp.float32),
                ns_final if r == rounds - 2 else ns_mid)
        return Vt

    return jax.jit(f32_matmuls(fn))


VARIANTS = {
    "a_iters16": make_variant(4, "cubic", 12, 8),
    "b_iters8": make_variant(2, "cubic", 12, 8),
    "g_e2_r4": make_variant(4, "cubic", 12, 8, squarings=1),   # 8 eff
    "h_e2_r8": make_variant(8, "cubic", 12, 8, squarings=1),   # 16 eff
    "i_e1_r8": make_variant(8, "cubic", 12, 8, squarings=0),   # 8 eff
}


def fence(x):
    np.asarray(jax.device_get(x.ravel()[:4]))


def proj_err(Vt, Vtrue):
    """per-window ||P_est - P_true||_F / sqrt(2K)  (B,)."""
    V = np.asarray(Vt).transpose(0, 2, 1)  # (B, n2, K2)
    Pe = np.einsum("bik,bjk->bij", V, V)
    Pt = np.einsum("bik,bjk->bij", Vtrue, Vtrue)
    d = np.linalg.norm((Pe - Pt).reshape(B, -1), axis=-1)
    return d / np.sqrt(K2)


def main():
    spreads = ([float(s) for s in sys.argv[1:]]
               if len(sys.argv) > 1 else [2.0, 10.0, 100.0])
    data = {s: make_E(spread=s) for s in spreads}
    E_dev = {s: jax.device_put(e) for s, (e, _) in data.items()}
    for s in spreads:
        fence(E_dev[s])
    print(f"B={B} n2={n2} K2={K2} (paired spectra)")
    for name, fn in VARIANTS.items():
        # time once (spread-independent)
        out = fn(E_dev[spreads[0]])
        fence(out)
        fence(fn(E_dev[spreads[0]]))
        t0 = time.perf_counter()
        it = 16
        o = None
        for _ in range(it):
            o = fn(E_dev[spreads[0]])
        fence(o)
        dt = (time.perf_counter() - t0) / it
        line = f"{name:14s} {dt * 1e3:7.2f} ms  "
        for s in spreads:
            e = proj_err(np.asarray(fn(E_dev[s])), data[s][1])
            frac = float((e > 0.1).mean())
            line += (f"| s={s:g}: mean={e.mean():.1e} "
                     f"p999={np.quantile(e, 0.999):.1e} bad={frac:.4f} ")
        print(line, flush=True)


if __name__ == "__main__":
    main()
