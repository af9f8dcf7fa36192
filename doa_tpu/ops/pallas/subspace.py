"""Fused signal-subspace Pallas TPU kernel (power iteration in VMEM).

The XLA subspace iteration re-reads the embedded covariances E: f32
[B, 2N, 2N] once per power iteration — 17 HBM passes over an array that
the TPU stores 4× lane-padded (2N = 32 < the 128-lane tile), measured at
12.3 ms for the headline config, the single largest stage. This kernel
reads E ONCE per window and runs the entire iteration in VMEM:

* **Powering by block-diagonal squaring.** Per group of `gw = 128//2N`
  windows, the (2N, 2N) blocks are packed into one (128, 128)
  block-diagonal matrix; block-diagonal structure is closed under
  multiplication, so `squarings` squaring passes yield E^(2^s) for
  every window in the group at full-tile MXU shapes (the wasted
  off-diagonal flops, gw×, are far cheaper than gw separate 2N-wide
  matmuls, which underfill the MXU lane grid the same way but also pay
  per-op latency).

* **V iteration:** V₀ = first 2K columns of E^(2^s), then
  `rounds = iters // 2^s` rounds of V ← orth(E^(2^s) V). The squaring
  count is the same speed-vs-imbalance-robustness dial as the XLA
  path's (cpx_ops.signal_subspace_from_E_T: e4 ≲ spread 2, e2 ≲ 5,
  e1 ≲ 20; the subspace guard catches spreads beyond the schedule).

* **Consolidated Newton-Schulz.** The per-window (2K, 2K) Gram matrices
  of ALL W windows in a program form one (W·2K, W·2K) block-diagonal
  matrix (cross-window blocks vanish because windows occupy disjoint
  rows of the consolidated V), so one NS chain of (128,128)-class
  matmuls orthonormalizes every window at once — no (B, 4, 4)-shaped
  HBM tensors anywhere (those pad 32× on TPU).

Output is the LANE-PACKED layout the fused MUSIC scan kernel consumes
directly ((B//BT, BT·2K, 2N) with BT = W): subspace → scan crosses HBM
once as 33 MB instead of 270+ MB of padded (B, 2N, 2K) tensors.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _subspace_kernel(e_ref, sel_ref, rep_ref, eye_ref, d_ref, out_ref, *,
                     W: int, n2: int, k2: int, gw: int, rounds: int,
                     ns_iters: int, ns_iters_mid: int, squarings: int):
    # The NS chain is the kernel's cost currency (dependent 128-class
    # matmuls). Two reductions vs the r1 schedule:
    #   * Jacobi preconditioning: G̃ = D^{-1/2} G D^{-1/2} (D = diag G).
    #     After V ← E⁴V the Gram's conditioning is dominated by column
    #     NORM spread (∝ eigenvalue⁴ ratios); the diagonal rescale
    #     removes that component exactly, leaving NS only the
    #     correlation structure — ns_iters drops from 12 to ~8 for the
    #     same envelope (NS needs ≈ log2(cond)+3 iterations).
    #   * Middle rounds only need to keep the basis conditioned, not
    #     orthonormal to f32 (orthonormality is consumed by the SCAN,
    #     i.e. only the final basis): ns_iters_mid < ns_iters.
    # The subspace guard (ops.cpx_ops.guarded_signal_subspace) remains
    # the envelope check for pathological spreads.
    ng = W // gw
    bd = gw * n2            # block-diagonal side (≤ 128 by construction)
    wk = W * k2             # consolidated V column count

    f32 = jnp.float32
    # explicit HIGHEST: Mosaic dots default to single-pass bf16, which
    # breaks the iteration's convergence exactly like the XLA default
    # precision did (docs/PERF.md "matmul precision"); HIGHEST = true
    # f32 via multi-pass MXU.
    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)
    dotT = lambda a, b: jax.lax.dot_general(  # contract rows: aᵀ·b  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)

    e = e_ref[...]                                   # (W, n2, n2)

    def blockdiag(blocks, r, c):
        """Concat-grid block-diagonal builder (Mosaic has no
        dynamic_update_slice; pure static concats lower fine)."""
        n = len(blocks)
        if n == 1:
            return blocks[0]
        z = jnp.zeros((r, c), f32)
        return jnp.concatenate([
            jnp.concatenate(
                [blocks[i] if j == i else z for j in range(n)], axis=1)
            for i in range(n)], axis=0)

    ri = jax.lax.broadcasted_iota(jnp.int32, (bd, bd), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (bd, bd), 1)
    eyeBD = jnp.where(ri == ci, 1.0, 0.0).astype(f32)
    ones_row = jnp.ones((1, bd), f32)

    # --- E⁴ per group via block-diagonal squaring ---------------------
    # Per-window trace normalization (spectrum → O(1): powering can't
    # overflow, NS starts near its basin) happens ON THE BLOCK-DIAGONAL
    # with 2-D ops only — a 3-D masked reduce over (W, n2, n2) reliably
    # SIGABRTs this container's Mosaic toolchain (bisected to exactly
    # that primitive; 3-D broadcasts are fine).
    E4s, Vs_g = [], []
    for g in range(ng):
        blk = blockdiag([e[g * gw + i] for i in range(gw)], n2, n2)
        diag = dot(ones_row, blk * eyeBD)            # (1, bd) diagonal
        scale_cols = []
        for i in range(gw):
            tr_i = jnp.sum(diag[:, i * n2:(i + 1) * n2]) / n2
            scale_cols.append(
                jnp.zeros((1, n2), f32)
                + 1.0 / jnp.maximum(tr_i, 1e-30))
        blk = blk * jnp.concatenate(scale_cols, axis=1)
        for _ in range(squarings):                   # E^(2^sq) per window
            blk = dot(blk, blk)
            blk = 0.5 * (blk + blk.T)
        E4s.append(blk)
        Vs_g.append(dot(blk, sel_ref[...]))          # (bd, gw·k2)

    # --- rounds of consolidated orthonormalize (+ E⁴ apply) -----------
    eye = eye_ref[...]                               # (wk, wk)
    eyeWK = eye
    for r in range(rounds):
        if r > 0:
            Vs_g = [dot(E4s[g], Vs_g[g]) for g in range(ng)]
        V = blockdiag(Vs_g, bd, gw * k2)             # (W·n2, wk)
        G = dotT(V, V)                               # (wk, wk) block-diag
        # Jacobi preconditioning: d = rsqrt(diag G) as a row vector via
        # the ones-row matmul (2-D ops only — 3-D masked reduces SIGABRT
        # this toolchain); G̃ = G ∘ (dᵀ d) has unit diagonal.
        ones_wk = jnp.ones((1, wk), f32)
        diagG = dot(ones_wk, G * eyeWK)              # (1, wk)
        d = jax.lax.rsqrt(jnp.maximum(diagG, 1e-30))
        G = G * d * d.T
        # Per-window Frobenius norm of the PRECONDITIONED Gram (an UPPER
        # bound on λmax — the trace mean is not, and Newton-Schulz
        # diverges outside λ(Gn) < 2). ‖G_w‖_F reaches every column of
        # window w through one matmul with the 0/1 block-replicator,
        # keeping the whole step MXU-shaped.
        sq = jnp.sum(G * G, axis=0, keepdims=True)       # (1, wk)
        fro = jnp.sqrt(dot(sq, rep_ref[...]))        # per-window → cols
        inv = 1.0 / jnp.maximum(fro, 1e-30)
        Gn = G * inv                                 # column scale = /‖·‖_F
        Y, Z = Gn, eye
        final = r == rounds - 1 or r == 0
        for _ in range(ns_iters if final else ns_iters_mid):
            T = 1.5 * eye - 0.5 * dot(Z, Y)
            Y = dot(Y, T)
            Z = dot(T, Z)
        # right factor: D^{-1/2} Z̃ / √fro — (V D^{-1/2} Z̃)ᵀ(·) = Z̃ᵀG̃Z̃ = I
        V = dot(V * d, Z) * jax.lax.rsqrt(jnp.maximum(fro, 1e-30))
        if r < rounds - 1:
            Vs_g = [V[g * bd:(g + 1) * bd,
                      g * gw * k2:(g + 1) * gw * k2] for g in range(ng)]

    # --- emit packed layout: row w·k2+k ← V[w·n2:(w+1)·n2, w·k2+k]ᵀ ---
    # V is window-block-diagonal THROUGHOUT the iteration (V₀ = E⁴·sel
    # is; G = VᵀV is then k2-block-diagonal, so every NS polynomial Z
    # is too, and V·Z preserves the structure). Hence the block-sum
    # VgᵀD (D = identity-stack) collapses each group's packed rows in
    # ONE matmul — cross-window terms are structurally zero — replacing
    # the W masked-add emit loop of the r1 kernel.
    outs = []
    for g in range(ng):
        Vg = V[g * bd:(g + 1) * bd, g * gw * k2:(g + 1) * gw * k2]
        outs.append(jax.lax.dot_general(
            Vg, d_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST))    # (gw·k2, n2)
    out_ref[...] = jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "num_sources", "iters", "ns_iters", "ns_iters_mid",
    "groups_per_block", "interpret", "squarings"))
def subspace_packed_pallas(E, num_sources: int, iters: int = 8,
                           ns_iters: int = 12, ns_iters_mid: int = 8,
                           groups_per_block: int = 0,
                           interpret: bool = False, squarings: int = 2):
    """E: f32[B, 2N, 2N] embedded covariances → packed orthonormal signal
    subspace f32[ceil(B/W)·W·2K, 2N] (rows = (window, k); reshape to
    (nb, W·2K, 2N) with W = packing_width(2N) feeds
    ops.pallas.music_scan directly; see `packed_to_batched` for the
    (B, 2N, 2K) view). Effective power-iteration count is
    rounds·2^squarings with rounds = max(1, iters // 2^squarings);
    `squarings` sets the robustness envelope exactly as in
    cpx_ops.signal_subspace_from_E_T (the in-kernel squaring runs on the
    gw-window block-diagonal)."""
    B, n2, _ = E.shape
    k2 = 2 * num_sources
    gw = max(1, 128 // n2)
    if groups_per_block == 0:
        groups_per_block = _auto_gpb(n2, k2)
    W = gw * groups_per_block
    rounds = max(1, iters // (1 << squarings))

    Bp = ((B + W - 1) // W) * W
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(n2, dtype=E.dtype),
                               (Bp - B, n2, n2))
        E = jnp.concatenate([E, pad], axis=0)

    sel = np.zeros((gw * n2, gw * k2), np.float32)
    for i in range(gw):
        for k in range(k2):
            sel[i * n2 + k, i * k2 + k] = 1.0
    wk = W * k2
    rep = np.zeros((wk, wk), np.float32)   # 0/1 block replicator
    for w in range(W):
        rep[w * k2:(w + 1) * k2, w * k2:(w + 1) * k2] = 1.0
    eye = np.eye(wk, dtype=np.float32)
    D = np.zeros((gw * n2, n2), np.float32)   # identity-stack block sum
    for i in range(gw):
        D[i * n2:(i + 1) * n2, :] = np.eye(n2, dtype=np.float32)

    out = pl.pallas_call(
        functools.partial(_subspace_kernel, W=W, n2=n2, k2=k2, gw=gw,
                          rounds=rounds, ns_iters=ns_iters,
                          ns_iters_mid=ns_iters_mid, squarings=squarings),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((W, n2, n2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gw * n2, gw * k2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wk, wk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wk, wk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gw * n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wk, n2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * k2, n2), jnp.float32),
        interpret=interpret,
    )(E, jnp.asarray(sel), jnp.asarray(rep), jnp.asarray(eye),
      jnp.asarray(D))
    return out


def _auto_gpb(n2: int, k2: int) -> int:
    """Default groups_per_block: target a consolidated NS width
    wk = W·k2 of 256 (measured best at the headline shape — halves the
    per-window op count of the latency-bound NS chain vs wk=128, while
    wk=512 tips the chain flop-bound and loses 2.5×), bounded to ≥1."""
    gw = max(1, 128 // n2)
    return max(1, 256 // max(gw * k2, 1))


def packing_width(n2: int, num_sources: int,
                  groups_per_block: int = 0) -> int:
    """Windows per packed row-block (static; matches the kernel's W)."""
    if groups_per_block == 0:
        groups_per_block = _auto_gpb(n2, 2 * num_sources)
    return max(1, 128 // n2) * groups_per_block


def packed_to_batched(Vp, B: int, num_sources: int):
    """Packed (Bp·2K, 2N) rows → standard (B, 2N, 2K) subspace tensor."""
    k2 = 2 * num_sources
    n2 = Vp.shape[-1]
    V = Vp.reshape(-1, k2, n2)[:B]
    return jnp.swapaxes(V, 1, 2)
