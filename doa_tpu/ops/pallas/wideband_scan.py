"""Fused wideband subband-scan + incoherent-fusion Pallas TPU kernel.

The XLA form of the wideband incoherent fusion (ops.wideband.
wideband_music_cpx, a lax.scan over subbands) is TRAFFIC-bound at the
c5 shape: per subband it materializes den (B, G), the normalized
spectrum, and the accumulator — ~675 MB/subband of HBM round-trips,
21.4 ms standalone against an einsum-compute cost of ~8.4 ms
(docs/PERF.md c5 stage split). This kernel keeps den in VMEM: the
fused spectrum

    P[b, g] = (1/F) Σ_f  dmin_f[b] / den_f[b, g]
    den_f[b, g] = max(‖a_fg‖² − ‖V_fbᵀ ã_fg‖², tiny)
    dmin_f[b]   = min_g den_f[b, g]

is written ONCE; the only other HBM traffic is the inputs. Because
dmin_f needs the full grid row before any output bin can be emitted,
the grid makes TWO passes (leading grid dim p): pass 0 computes den
tile-by-tile and min-accumulates dmin into a VMEM scratch (persistent
across grid steps — the standard Mosaic accumulator pattern); pass 1
recomputes den and emits dmin/den. Compute therefore doubles
(2 passes × 3 hi/lo dots ≈ 6 single-pass MXU sweeps) while traffic
drops ~5×: the steering stack is re-read once per window-block per
pass (2·nb·|At| ≈ 4.3 GB at c5 with BT=128) and V once per pass.

Precision: each den must be tf32-class — den is a cancellation
(nrm − ‖Y‖², down to ~1e-5·nrm at MUSIC nulls), and a single-pass bf16
dot's absolute error (~2⁻⁹·nrm) would swamp deep nulls and with them
the per-subband normalization dmin. Mosaic lowers only DEFAULT/HIGHEST,
so the kernel runs the 3-dot bf16 hi/lo split (hh + h·lo + lo·h ≈ one
tf32 einsum, ~2⁻²¹ relative — the same class as the XLA baseline's
ambient tf32). Per-window reduction over the 2K subspace columns is
exact f32 VPU adds on k-major-packed rows (no reducer matmul, no 3-D
reshape — both measured/known Mosaic hazards, docs/PERF.md).

Fallback contract: shape-sensitive Mosaic toolchains may refuse this
kernel (the repo's SIGABRT caveat) — callers select it via
DoaConfig.wb_fusion_impl with the XLA lax.scan form as the measured
fallback (bench.py try/except pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fusion_kernel(nrm_ref, v_ref, at_ref, out_ref, dmin_ref, *,
                   F: int, BT: int, k2: int):
    f32 = jnp.float32
    tiny = jnp.finfo(f32).tiny
    p = pl.program_id(0)
    bi = pl.program_id(1)
    gi = pl.program_id(2)
    bf16 = jnp.bfloat16
    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)

    def den_f(f):
        Vf = v_ref[0, f]                      # (k2·BT, n2) k-major rows
        Af = at_ref[f]                        # (n2, GT)
        vhi = Vf.astype(bf16)
        vlo = (Vf - vhi.astype(f32)).astype(bf16)
        ahi = Af.astype(bf16)
        alo = (Af - ahi.astype(f32)).astype(bf16)
        Y = dot(vhi, ahi) + dot(vhi, alo) + dot(vlo, ahi)
        Y2 = Y * Y
        part = Y2[0:BT]
        for k in range(1, k2):                # exact f32 VPU adds
            part = part + Y2[k * BT:(k + 1) * BT]
        return jnp.maximum(nrm_ref[f:f + 1] - part, tiny)  # (BT, GT)

    @pl.when(p == 0)
    def _pass_dmin():
        for f in range(F):
            m = jnp.min(den_f(f), axis=-1, keepdims=True)   # (BT, 1)
            rows = pl.ds(bi * BT, BT)
            old = dmin_ref[rows, f:f + 1]
            dmin_ref[rows, f:f + 1] = jnp.where(
                gi == 0, m, jnp.minimum(old, m))
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(p == 1)
    def _pass_emit():
        acc = jnp.zeros_like(out_ref)
        for f in range(F):
            dm = dmin_ref[pl.ds(bi * BT, BT), f:f + 1]       # (BT, 1)
            acc = acc + dm / den_f(f)
        out_ref[...] = acc * (1.0 / F)


@functools.partial(jax.jit, static_argnames=("block_b", "block_g",
                                             "interpret"))
def wideband_fused_spectrum_pallas(V, At_emb, *, block_b: int = 128,
                                   block_g: int = 128,
                                   interpret: bool = False):
    """V: f32[F, B, 2N, 2K] per-subband embedded signal subspaces
    (ops.wideband.subband_subspaces layout); At_emb: f32[F, G, 2N]
    embedded per-subband steering ([ar; ai] rows) → fused incoherent
    spectrum f32[B, G] == mean over subbands of max-normalized
    reciprocal MUSIC spectra (exactly wideband_music_cpx's power-path
    fusion, tf32-class)."""
    F, B, n2, k2 = V.shape
    G = At_emb.shape[1]
    BT = block_b
    GT = block_g
    Bp = -(-B // BT) * BT
    Gp = -(-G // GT) * GT
    if Bp != B:
        # zero-padded windows scan to den = nrm (positive) everywhere;
        # their fused rows are sliced off below
        V = jnp.concatenate(
            [V, jnp.zeros((F, Bp - B, n2, k2), V.dtype)], axis=1)
    # k-major packing: chunk rows k·BT + w, so the per-window reduction
    # over the 2K columns is k2 contiguous (BT, GT) slices in-kernel
    Vk = jnp.swapaxes(V, -1, -2)                  # (F, Bp, k2, n2)
    Vk = Vk.reshape(F, Bp // BT, BT, k2, n2)
    Vk = jnp.moveaxis(Vk, 1, 0)                   # (nb, F, BT, k2, n2)
    Vk = jnp.swapaxes(Vk, 2, 3)                   # (nb, F, k2, BT, n2)
    Vk = Vk.reshape(Bp // BT, F, k2 * BT, n2)
    nrm = jnp.sum(At_emb * At_emb, axis=-1)       # (F, G)
    # pad grid bins with a huge norm: den there ≈ 1e30, never the min,
    # fused contribution ~0; sliced off below
    nrm_p = jnp.pad(nrm, ((0, 0), (0, Gp - G)), constant_values=1e30)
    At_T = jnp.swapaxes(At_emb, -1, -2)           # (F, 2N, G)
    At_T = jnp.pad(At_T, ((0, 0), (0, 0), (0, Gp - G)))
    nb, ng = Bp // BT, Gp // GT

    out = pl.pallas_call(
        functools.partial(_fusion_kernel, F=F, BT=BT, k2=k2),
        grid=(2, nb, ng),
        in_specs=[
            pl.BlockSpec((F, GT), lambda p, b, g: (0, g),
                         memory_space=pltpu.VMEM),            # nrm
            pl.BlockSpec((1, F, k2 * BT, n2),
                         lambda p, b, g: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # V packed
            pl.BlockSpec((F, n2, GT), lambda p, b, g: (0, 0, g),
                         memory_space=pltpu.VMEM),            # Atᵀ
        ],
        out_specs=pl.BlockSpec((BT, GT), lambda p, b, g: (b, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Gp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bp, F), jnp.float32)],
        interpret=interpret,
    )(nrm_p, Vk, At_T)
    return out[:B, :G]
