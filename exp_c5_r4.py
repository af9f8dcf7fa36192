"""exp_c5_r4.py — round-4 c5 flagship measurements (VERDICT r3 items 3/4).

Stages (arg = stage name; default "all"):
  base   — c5 default pipeline (wb_fast + warm XLA subspaces) after the
           r4 Ep-materialization skip; + bf16 subband-scan variant
  fused  — standalone XLA warm-refinement stage at the c5 subspace
           shape (the r3 warm_refine Pallas kernel this stage once
           compared against was REMOVED in r4 — it failed to compile
           at 2N=128 on this Mosaic toolchain; DoaConfig now rejects
           subspace_impl='fused'. See docs/PERF.md post-mortem.)
  hier   — hierarchical wideband scan with the r4 chunked refinement:
           full-grid coarse (regression vs r3's 278.5 ms) and a 3°
           coarse grid (61×31) + refine, angle parity vs dense
Run on TPU: timeout 1200 python exp_c5_r4.py base   (etc., ONE at a time)
"""

import dataclasses
import sys
import time

import numpy as np


def _log(m):
    print(m, file=sys.stderr, flush=True)


def _fence(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def _time(call, iters=8, warm=2):
    for _ in range(warm):
        _fence(call())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = call()
    _fence(out)
    return (time.perf_counter() - t0) / iters


def _capture(T):
    from doa_tpu.io.synthetic import SourceSpec, synth_wideband_ura_iq
    return synth_wideband_ura_iq(
        [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.0,
                    bandwidth_norm=0.5),
         SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.0,
                    bandwidth_norm=0.5)],
        (8, 8), 0.5, T, fractional_bw=0.1, snr_db=10,
        seed=0).astype(np.complex64)


def _pipe_call(cfg, x, label):
    import jax
    import jax.numpy as jnp
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    N = 64
    T = x.shape[0]
    pipe = build_pipeline_tpu(cfg, return_spectra=False)
    assert pipe.wb_fast, f"{label}: wb_fast gate did not engage"
    xil = jax.device_put(
        np.ascontiguousarray(x).view(np.float32).reshape(T, 2 * N))
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    Ar, Ai = pipe.steering_planes
    wbi = pipe.wb_ilv_args
    return lambda: pipe.jitted_ilv(xil, cr, ci, Ar, Ai, *wbi)


def _report(label, call, B):
    _log(f"compiling {label} …")
    t0 = time.perf_counter()
    _fence(call())
    _log(f"  compile+first: {time.perf_counter() - t0:.1f} s")
    dt = _time(call)
    _log(f"  {label}: {dt*1e3:.2f} ms/call pipelined "
         f"({B/dt:.0f} snapshots/s, {B/dt/9765.6:.2f}x real-time)")
    out = call()
    ang = np.asarray(out["peak_angles"]["music"])
    med = np.median(ang.reshape(-1, 2, 2), axis=0)
    _log(f"  median (az, el) pairs: {med.tolist()}")
    return dt, ang


def stage_base():
    from doa_tpu.configs import PRESETS

    cfg = dataclasses.replace(PRESETS["c5_ura64_wideband"],
                              cov_impl="pallas")
    B = 2048
    x = _capture(B * cfg.snapshot_size)
    dt0, ang0 = _report("c5 default (warm XLA subspace, r4 Ep-skip)",
                        _pipe_call(cfg, x, "default"), B)
    cfg_bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    dt1, ang1 = _report("c5 bf16 subband scan",
                        _pipe_call(cfg_bf, x, "bf16"), B)
    _log(f"  bf16 angle delta vs f32: "
         f"{np.abs(ang1 - ang0).max():.4f} deg")


def stage_fused():
    """Standalone XLA warm-refinement stage at the c5 subspace shape.

    Measured r4 (this stage, before the warm_refine kernel's removal):
    XLA warm stage 20.73 ms (3 applies + detector over (32768, 128,
    128) — 1.2× its 4-pass E-read floor at the measured 495 GB/s);
    the warm_refine Pallas kernel FAILED TO COMPILE at this shape on
    this Mosaic toolchain (tpu_compile_helper exit 1), standalone AND
    in-pipeline — the kernel was removed (docs/PERF.md post-mortem)."""
    import jax
    import jax.numpy as jnp
    from doa_tpu.ops import cpx_ops

    B = 2048
    F, n2, K = 16, 128, 2
    rng = np.random.default_rng(0)
    A = rng.standard_normal((F * B, n2, 8)).astype(np.float32)
    E = jax.device_put(
        np.einsum("bik,bjk->bij", A, A).astype(np.float32)
        + 0.1 * np.eye(n2, dtype=np.float32))
    Vt_bar = cpx_ops.signal_subspace_from_E_T(
        jnp.mean(E.reshape(F, B, n2, n2), axis=1), K, iters=8)
    Vt_bar.block_until_ready()

    init = jnp.broadcast_to(
        Vt_bar[:, None], (F, B, 2 * K, n2)).reshape(F * B, 2 * K, n2)
    xla_warm = jax.jit(lambda e: cpx_ops.signal_subspace_from_E_T(
        e, K, iters=3, init=init, escalate_extra=40))
    _log("compiling XLA warm refinement (standalone) …")
    dt = _time(lambda: xla_warm(E))
    _log(f"  XLA warm subspace stage (3 applies + detector): "
         f"{dt*1e3:.2f} ms")


def stage_hier():
    from doa_tpu.configs import GridSpec2D, PRESETS

    cfg = dataclasses.replace(PRESETS["c5_ura64_wideband"],
                              cov_impl="pallas")
    B = 2048
    x = _capture(B * cfg.snapshot_size)
    dt_d, ang_d = _report("c5 dense (reference row)",
                          _pipe_call(cfg, x, "dense"), B)

    cfg_h = dataclasses.replace(cfg, scan_mode="hierarchical")
    dt_h, ang_h = _report("c5 hierarchical FULL coarse grid (181x91)",
                          _pipe_call(cfg_h, x, "hier-full"), B)

    cfg_hc = dataclasses.replace(
        cfg, scan_mode="hierarchical",
        grid2d=GridSpec2D(num_az=61, num_el=31))
    dt_c, ang_c = _report("c5 hierarchical 3-deg coarse grid (61x31)",
                          _pipe_call(cfg_hc, x, "hier-coarse"), B)
    # parity: refined coarse-grid peaks vs the dense grid's argmax
    # (dense grid is 1-deg az / 1-deg el, so agreement ≤ ~0.6 deg)
    d = np.sort(ang_d.reshape(-1, 2, 2), axis=1)
    c = np.sort(ang_c.reshape(-1, 2, 2), axis=1)
    _log(f"  hier-coarse vs dense: median |delta| = "
         f"{np.median(np.abs(c - d)):.3f} deg, "
         f"p99 = {np.quantile(np.abs(c - d), 0.99):.3f} deg")


def stage_split():
    """Standalone c5 stage attribution: front-end kernel, warm
    subspace, scan+fusion (current lax.scan form vs restructured
    two-pass chunked form), peaks — to aim the next optimization."""
    import jax
    import jax.numpy as jnp
    from doa_tpu.configs import PRESETS
    from doa_tpu.cpx import Cpx, embed_vector
    from doa_tpu.ops import cpx_ops
    from doa_tpu.ops.wideband import wideband_steering_stack
    from doa_tpu.pipeline import _steering_fn

    cfg = dataclasses.replace(PRESETS["c5_ura64_wideband"],
                              cov_impl="pallas")
    B, F, N, K = 2048, 16, 64, 2
    n2, k2 = 2 * N, 2 * K
    G = cfg.grid2d.num_az * cfg.grid2d.num_el
    rng = np.random.default_rng(0)

    # V stack (F, B, 2N, 2K) and steering stack (F, G, N)
    Vh = rng.standard_normal((F, B, n2, k2)).astype(np.float32)
    Vh /= np.linalg.norm(Vh, axis=2, keepdims=True)
    V = jax.device_put(Vh)
    A_host = wideband_steering_stack(cfg, _steering_fn(cfg))
    Ar = jax.device_put(A_host.real.astype(np.float32))
    Ai = jax.device_put(A_host.imag.astype(np.float32))

    def scan_current(V, Ar, Ai):
        def step(acc, vA):
            v, ar, ai = vA
            den = jnp.maximum(cpx_ops.music_denominator_subspace(
                v, Cpx(ar, ai)), 0.0)
            P = 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
            return acc + P / jnp.max(P, axis=-1, keepdims=True), None
        acc0 = jnp.zeros((B, G), jnp.float32)
        return jax.lax.scan(step, acc0, (V, Ar, Ai))[0] / F

    def scan_twopass(V, Ar, Ai, chunk=2048):
        """Pass 1: per-subband dmin over g WITHOUT materializing the
        (B, G) den (g-chunked running min); pass 2: g-chunked fused
        accumulation written once. 2× the einsum flops, ~1/3 the HBM
        traffic of the scan-current form."""
        At = jnp.concatenate([jnp.swapaxes(Ar, 1, 2),
                              jnp.swapaxes(Ai, 1, 2)], axis=1)  # (F,2N,G)
        nch = -(-G // chunk)
        Gp = nch * chunk
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Gp - G)))
        Atc = jnp.moveaxis(At.reshape(F, n2, nch, chunk), 2, 0)

        def den_chunk(atc, v):                     # (F,2N,C),(F,B,2N,2K)
            # k-before-g output order: a (…, 2K) minor dim pads 32×
            # (measurement lesson 1) — keep C minor, 2K second-minor.
            Y = jnp.einsum("fng,fbnk->fbkg", atc, v,
                           preferred_element_type=jnp.float32)
            nrm = jnp.sum(atc * atc, axis=1)       # (F, C)
            return jnp.maximum(
                nrm[:, None] - jnp.sum(Y * Y, 2),
                jnp.finfo(jnp.float32).tiny)       # (F, B, C)

        def min_step(dmin, atc):
            return jnp.minimum(dmin, jnp.min(den_chunk(atc, V), -1)), None
        dmin0 = jnp.full((F, B), jnp.inf, jnp.float32)
        dmin = jax.lax.scan(min_step, dmin0, Atc)[0]   # (F, B)

        def acc_step(_, atc):
            d = den_chunk(atc, V)
            return None, jnp.sum(dmin[..., None] / d, axis=0) / F
        out = jax.lax.scan(acc_step, None, Atc)[1]     # (nch, B, C)
        return jnp.moveaxis(out, 0, 1).reshape(B, Gp)[:, :G]

    jc = jax.jit(scan_current)
    _log("compiling scan-current …")
    dt_c = _time(lambda: jc(V, Ar, Ai))
    _log(f"  scan+fusion (current lax.scan-over-subbands): "
         f"{dt_c*1e3:.2f} ms")
    jt = jax.jit(scan_twopass)
    _log("compiling scan-twopass …")
    dt_t = _time(lambda: jt(V, Ar, Ai))
    _log(f"  scan+fusion (two-pass g-chunked): {dt_t*1e3:.2f} ms")
    P1 = np.asarray(jc(V, Ar, Ai))
    P2 = np.asarray(jt(V, Ar, Ai))
    _log(f"  parity |current − twopass| max: "
         f"{np.max(np.abs(P1 - P2)):.2e}")

    # peaks stage on the fused spectrum
    from doa_tpu.ops.peaks import find_local_max_2d
    g2 = cfg.grid2d
    fused = jt(V, Ar, Ai)
    fused.block_until_ready()
    jp = jax.jit(lambda P: find_local_max_2d(
        P.reshape(B, g2.num_az, g2.num_el), 2,
        (g2.az_lo_deg, g2.az_hi_deg), (g2.el_lo_deg, g2.el_hi_deg)))
    dt_p = _time(lambda: jp(fused))
    _log(f"  2-D peaks on fused spectrum: {dt_p*1e3:.2f} ms")

    # bf16 variants of both scan forms
    def scan_current_bf16(V, Ar, Ai):
        def step(acc, vA):
            v, ar, ai = vA
            den = jnp.maximum(cpx_ops.music_denominator_subspace(
                v, Cpx(ar, ai), compute_dtype=jnp.bfloat16), 0.0)
            P = 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
            return acc + P / jnp.max(P, axis=-1, keepdims=True), None
        acc0 = jnp.zeros((B, G), jnp.float32)
        return jax.lax.scan(step, acc0, (V, Ar, Ai))[0] / F

    jb = jax.jit(scan_current_bf16)
    _log("compiling scan-current bf16 …")
    dt_b = _time(lambda: jb(V, Ar, Ai))
    _log(f"  scan+fusion (current, bf16): {dt_b*1e3:.2f} ms")


STAGES = {"base": stage_base, "fused": stage_fused, "hier": stage_hier,
          "split": stage_split}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in STAGES.items():
        if which in (name, "all"):
            _log(f"=== stage {name} ===")
            fn()


if __name__ == "__main__":
    main()
