"""Round-2 subspace experiment: e1-schedule cost/robustness levers.

Levers: PACK width of the consolidated NS chain (cost), NS kind/count
(robustness). Spreads are signal-eigenvalue ratios; spread s ~ s dB? no:
power ratio in dB = 10*log10(s).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from doa_tpu.cpx import f32_matmuls

B, n2, K = 16384, 32, 2
K2 = 2 * K


def make_E(spread, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n2, n2)).astype(np.float32)
    Q, _ = np.linalg.qr(A)
    sig = np.repeat(np.geomspace(spread, 1.0, K), 2).astype(np.float32)
    lam = np.concatenate([sig, np.full((n2 - K2,), noise, np.float32)])
    E = np.einsum("bik,k,bjk->bij", Q, lam, Q).astype(np.float32)
    return 0.5 * (E + np.swapaxes(E, -1, -2)), Q[..., :K2]


def make_variant(rounds, ns_kind, ns_final, ns_mid, squarings, pack):
    mask = jnp.asarray(np.kron(np.eye(pack, dtype=np.float32),
                               np.ones((K2, K2), np.float32)))
    eyeP = jnp.eye(pack * K2, dtype=jnp.float32)

    def mm(a, b):
        return jnp.einsum("bij,bjk->bik", a, b,
                          preferred_element_type=jnp.float32)

    def orth(Vt, n_ns):
        Bp = Vt.shape[0]
        Vp = Vt.reshape(Bp // pack, pack * K2, n2)
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
                T = 1.5 * eyeP - 0.5 * mm(Z, Y)
                Y = mm(Y, T)
                Z = mm(T, Z)
        else:
            for _ in range(n_ns):
                M = mm(Z, Y)
                T = (15.0 * eyeP - 10.0 * M + 3.0 * mm(M, M)) / 8.0
                Y = mm(Y, T)
                Z = mm(T, Z)
        out = mm(Z, Vp / dg[..., :, None]) / jnp.sqrt(fro)[..., :, None]
        return out.reshape(Bp, K2, n2)

    def fn(E):
        tr = jnp.einsum("bii->b", E)[:, None, None] / n2
        Ep = E / jnp.maximum(tr, 1e-30)
        for _ in range(squarings):
            Ep = mm(Ep, Ep)
        Vt = orth(Ep[..., :K2, :], ns_final)
        for r in range(rounds - 1):
            Vt = orth(jnp.einsum("bkn,bnm->bkm", Vt, Ep,
                                 preferred_element_type=jnp.float32),
                      ns_final if r == rounds - 2 else ns_mid)
        return Vt

    return jax.jit(f32_matmuls(fn))


VARIANTS = {
    "i_e1_p4":   make_variant(8, "cubic", 12, 8, 0, 4),
    "i_e1_p8":   make_variant(8, "cubic", 12, 8, 0, 8),
    "i_e1_p16":  make_variant(8, "cubic", 12, 8, 0, 16),
    "q_e1_quin": make_variant(8, "quintic", 10, 7, 0, 8),
    "r_e1_ns20": make_variant(8, "cubic", 20, 14, 0, 8),
    "s_e1_mid6": make_variant(8, "cubic", 12, 6, 0, 8),
}


def fence(x):
    np.asarray(jax.device_get(x.ravel()[:4]))


def proj_err(Vt, Vtrue):
    V = np.asarray(Vt).transpose(0, 2, 1)
    Pe = np.einsum("bik,bjk->bij", V, V)
    Pt = np.einsum("bik,bjk->bij", Vtrue, Vtrue)
    return np.linalg.norm((Pe - Pt).reshape(B, -1), axis=-1) / np.sqrt(K2)


def main():
    spreads = [10.0, 30.0, 100.0, 300.0]
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
        line = f"{name:11s} {dt * 1e3:6.2f} ms "
        for s in spreads:
            e = proj_err(np.asarray(fn(E_dev[s])), data[s][1])
            line += (f"| s={s:g}: p999={np.quantile(e, 0.999):.1e} "
                     f"bad={float((e > 0.1).mean()):.4f} ")
        print(line, flush=True)


if __name__ == "__main__":
    main()
