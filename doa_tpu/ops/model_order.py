"""Source-count (model-order) estimation: AIC / MDL from covariance
eigenvalues.

The reference requires `num_targets` a priori (MUSIC_lin_array arg);
a production estimator must detect how many emitters are present. The
classic information-theoretic criteria (Wax & Kailath) pick K minimizing

    crit(k) = -S·(N−k)·log( g_k / a_k ) + penalty(k)

where g_k/a_k are the geometric/arithmetic means of the N−k smallest
eigenvalues, penalty = k(2N−k) · (log S  for MDL · ½ | 1 for AIC).

Batched and complex-free: eigenvalues come from the real 2N embedding
(doubled spectrum → every other sorted value). K_est is a per-window
int array for monitoring/adaptation; subspace dims inside a compiled
pipeline stay static (re-jit when K changes — configs are jit-static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from doa_tpu.cpx import Cpx, embed_hermitian


def eigenvalues_cpx(R: Cpx):
    """Ascending eigenvalues f32[..., N] of Hermitian R via the real
    embedding (doubled spectrum, take every other)."""
    E = embed_hermitian(R)
    w = jnp.linalg.eigvalsh(E)
    return w[..., ::2]


def estimate_num_sources(R: Cpx, num_snapshots: int,
                         criterion: str = "mdl", max_k: int | None = None):
    """R: Cpx[B, N, N], num_snapshots: S → K_est i32[B].

    criterion: "mdl" (consistent) or "aic" (tends to overestimate)."""
    N = R.shape[-1]
    S = num_snapshots
    if max_k is None:
        max_k = N - 1
    w = eigenvalues_cpx(R)                          # ascending (B, N)
    w = jnp.maximum(w, 1e-12)
    logw = jnp.log(w)
    # suffix sums over the N-k smallest eigenvalues
    csum = jnp.cumsum(w, axis=-1)
    clog = jnp.cumsum(logw, axis=-1)
    ks = jnp.arange(0, max_k + 1)                   # candidate k
    m = N - ks                                      # noise dims
    # arithmetic / geometric means of the m smallest
    a = jnp.take(csum, m - 1, axis=-1) / m          # (B, K+1)
    g_log = jnp.take(clog, m - 1, axis=-1) / m
    llr = S * m * (jnp.log(a) - g_log)              # ≥ 0
    if criterion == "mdl":
        pen = 0.5 * ks * (2 * N - ks) * jnp.log(S)
    elif criterion == "aic":
        pen = ks * (2 * N - ks)
    else:
        raise ValueError(criterion)
    crit = llr + pen[None, :]
    return jnp.argmin(crit, axis=-1).astype(jnp.int32)
