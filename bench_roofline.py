"""Per-stage roofline on real TPU hardware (VERDICT r1 item 1).

Times each stage of the headline pipeline (16-el ULA, S=1024, G=1024,
K=2, B=16384) separately AND the fused program, with two fencing modes:

  * latency   — fence (device→host fetch) after every call: includes the
    ~25 ms relay overhead per call on tunneled backends.
  * pipelined — enqueue `iters` calls, fence once at the end: device
    programs execute in launch order, so fetching the last output
    guarantees all completed; amortizes dispatch → steady-state
    throughput, the honest streaming number.

For each stage prints bytes touched, FLOPs, achieved GB/s and GFLOP/s,
and % of v5e speed-of-light (819 GB/s HBM, 49 TFLOP/s f32 MXU,
197 TFLOP/s bf16). One JSON line per row on stdout; progress on stderr.

Run: timeout 590 python bench_roofline.py [T_pow2=24]
"""

import json
import sys
import time

import numpy as np

V5E_HBM = 819e9
V5E_F32 = 49e12
V5E_BF16 = 197e12


def log(m):
    print(f"[roofline] {m}", file=sys.stderr, flush=True)


def main():
    t_pow = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from doa_tpu.configs import (
        ArrayGeometry, DoaConfig, Estimator, GridSpec1D)
    from doa_tpu.cpx import Cpx, embed_vector, f32_matmuls
    from doa_tpu.ops import cpx_ops
    from doa_tpu.ops.peaks import find_local_max
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    SNAP, N, GRID, K = 1024, 16, 1024, 2
    T = 1 << t_pow
    B = T // SNAP
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=N,
                               norm_spacing=0.5),
        snapshot_size=SNAP, overlap=0, num_sources=K,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=GRID), num_max_vals=2)
    # production output shape (peaks only): the fused scan+peaks kernel
    # stays on and the (B, G) spectrum never reaches HBM — same build
    # bench.py measures
    pipe = build_pipeline_tpu(cfg, return_spectra=False)
    Ar, Ai = pipe.steering_planes

    log(f"T=2^{t_pow} B={B}; generating device data")
    kr, ki = jax.random.split(jax.random.key(0))
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]
                                  if hasattr(leaf, "ravel") else leaf))

    def measure(name, fn, args, gbytes, gflops, iters=8, peak=V5E_F32):
        log(f"{name}: compiling")
        fence(fn(*args))
        fence(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            fence(fn(*args))
        lat = (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        fence(outs[-1])
        pipe_t = (time.perf_counter() - t0) / iters
        row = {
            "stage": name, "B": B,
            "ms_latency": round(lat * 1e3, 2),
            "ms_pipelined": round(pipe_t * 1e3, 2),
            "gbytes": round(gbytes, 3), "gflops": round(gflops, 2),
            "achieved_GBps": round(gbytes / pipe_t, 1),
            "achieved_GFLOPs": round(gflops / pipe_t, 1),
            "pct_hbm_sol": round(100 * gbytes / pipe_t / (V5E_HBM / 1e9), 1),
            "pct_mxu_sol": round(100 * gflops / pipe_t / (peak / 1e9), 1),
        }
        print(json.dumps(row), flush=True)
        return row

    GB = 1e9
    n2, k2 = 2 * N, 2 * K

    # ---- PRODUCTION stage: fused interleaved-ingest covariance -------
    # (timing only — random data is random in any layout, so generate
    # the interleaved buffer directly instead of keeping planes alive)
    from doa_tpu.ops.pallas.cov_embedded import (cov_embedded_pallas,
                                                 interleave_factor)
    tp = interleave_factor(N)
    xil = jax.block_until_ready(jax.random.normal(
        kr, (T // tp, 2 * N * tp), jnp.float32))
    covf = jax.jit(f32_matmuls(lambda z, cr, ci: cov_embedded_pallas(
        z, cr, ci, N=N, snapshot_size=SNAP)))
    covf_bytes = (T * 2 * N * 4 + B * n2 * n2 * 4) / GB
    # full-lane 128-wide Gram, 2 bf16 dots (hi/lo split) over T/tp rows
    covf_flops = (2 * 2 * (T // tp) * 128 * 128) / GB
    measure("covariance_fused (production)", covf, (xil, cr, ci),
            covf_bytes, covf_flops, peak=V5E_BF16)
    E_win = jax.block_until_ready(covf(xil, cr, ci))

    # ---- PRODUCTION stage: warm-start subspace (the default) ---------
    def sub_warm(E):
        Vt_bar = cpx_ops.signal_subspace_from_E_T(
            jnp.mean(E, axis=0)[None], K, iters=8)
        init = jnp.broadcast_to(Vt_bar, (E.shape[0],) + Vt_bar.shape[1:])
        return cpx_ops.signal_subspace_from_E_T(E, K, iters=3, init=init)

    warm_bytes = (B * n2 * n2 * 4 * (3 + 1) + B * n2 * k2 * 4 * 8) / GB
    warm_flops = (3 * 2 * B * n2 * n2 * k2) / GB
    measure("subspace_warm_3 (default)", jax.jit(f32_matmuls(sub_warm)),
            (E_win,), warm_bytes, warm_flops)

    # ---- PRODUCTION full pipeline: zero-copy interleaved entry -------
    fullf = lambda z: pipe.jitted_ilv(z, cr, ci, Ar, Ai)  # noqa: E731
    fullf_bytes = covf_bytes + warm_bytes
    fullf_flops = covf_flops + warm_flops
    rowf = measure("full_pipeline_ilv (production)", fullf, (xil,),
                   fullf_bytes, fullf_flops)
    snaps = B / (rowf["ms_pipelined"] / 1e3)
    print(json.dumps({"stage": "headline_production",
                      "snapshots_per_s_pipelined": round(snaps, 1),
                      "x_realtime": round(snaps / (10e6 / SNAP), 2)}),
          flush=True)
    del xil, E_win      # free HBM before the planes-path stages
    xr = jax.random.normal(kr, (T, N), jnp.float32)
    xi = jax.random.normal(ki, (T, N), jnp.float32)

    # ---- comparison stage: covariance (XLA chunk Grams) --------------
    cov = jax.jit(f32_matmuls(lambda xr, xi: cpx_ops.cov_from_stream_cpx(
        Cpx(xr, xi), SNAP, 0).re))
    cov_bytes = (2 * T * N * 4 + B * 2 * N * N * 4) / GB
    cov_flops = (2 * T * n2 * n2) / GB
    measure("covariance", cov, (xr, xi), cov_bytes, cov_flops)

    # ---- stage: subspace iteration (both production schedules) -------
    R = jax.block_until_ready(
        cpx_ops.cov_from_stream_cpx(Cpx(xr, xi), SNAP, 0))
    sub = jax.jit(f32_matmuls(lambda rr, ri: cpx_ops.signal_subspace_embedded(
        Cpx(rr, ri), K, iters=8, squarings=0)))
    it_total = 8 + 9   # 8 E@V applies + ~9 orthonormalize passes over V
    sub_bytes = (B * n2 * n2 * 4 * (8 + 1) + B * n2 * k2 * 4 * it_total) / GB
    sub_flops = (8 * 2 * B * n2 * n2 * k2) / GB
    measure("subspace_e1_8 (default)", sub, (R.re, R.im), sub_bytes,
            sub_flops)
    sub4 = jax.jit(f32_matmuls(
        lambda rr, ri: cpx_ops.signal_subspace_embedded(
            Cpx(rr, ri), K, iters=8, squarings=2)))
    sub4_bytes = (B * n2 * n2 * 4 * 7 + B * n2 * k2 * 4 * 8) / GB
    sub4_flops = ((2 * 2 * B * n2 ** 3) + 2 * 2 * B * n2 * n2 * k2) / GB
    measure("subspace_e4_8 (bench)", sub4, (R.re, R.im), sub4_bytes,
            sub4_flops)

    V_emb = jax.block_until_ready(sub(R.re, R.im))

    # ---- stage: MUSIC scan (XLA einsum, f32) -------------------------
    At = jax.block_until_ready(embed_vector(Cpx(Ar, Ai)))

    def scan_xla(V, At):
        nrm = jnp.sum(At * At, axis=-1)
        Y = jnp.einsum("gn,bnk->bgk", At, V,
                       preferred_element_type=jnp.float32)
        den = nrm[None, :] - jnp.sum(Y * Y, axis=-1)
        return 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)

    scan_bytes = (B * n2 * k2 * 4 + GRID * n2 * 4 + B * GRID * 4) / GB
    scan_flops = (2 * B * GRID * n2 * k2 + 3 * B * GRID * k2) / GB
    measure("music_scan_xla_f32", jax.jit(f32_matmuls(scan_xla)), (V_emb, At),
            scan_bytes, scan_flops)

    # ---- stage: MUSIC scan bf16 --------------------------------------
    def scan_bf16(V, At):
        nrm = jnp.sum(At * At, axis=-1)
        Y = jnp.einsum("gn,bnk->bgk", At.astype(jnp.bfloat16),
                       V.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        den = nrm[None, :] - jnp.sum(Y * Y, axis=-1)
        return 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)

    measure("music_scan_xla_bf16", jax.jit(f32_matmuls(scan_bf16)), (V_emb, At),
            scan_bytes, scan_flops, peak=V5E_BF16)

    # ---- stage: MUSIC scan Pallas lane-packed ------------------------
    try:
        from doa_tpu.ops.pallas.music_scan import music_scan_pallas
        measure("music_scan_pallas", lambda V, At: music_scan_pallas(V, At),
                (V_emb, At), scan_bytes, scan_flops)
    except Exception as e:
        log(f"pallas scan failed: {type(e).__name__}: {e}")

    # ---- stage: peaks --------------------------------------------------
    P = jax.block_until_ready(jax.jit(scan_xla)(V_emb, At))
    peaks = jax.jit(f32_matmuls(lambda P: find_local_max(
        P / jnp.max(P, -1, keepdims=True), 2, 0.0, 180.0)[1]))
    peaks_bytes = (3 * B * GRID * 4) / GB
    measure("normalize_peaks", peaks, (P,), peaks_bytes, 0.0)

    # ---- full pipeline, PLANES entry (XLA cov + fused downstream) ----
    full = lambda xr, xi: pipe.jitted(xr, xi, cr, ci, Ar, Ai)  # noqa: E731
    full_bytes = cov_bytes + sub_bytes + scan_bytes + peaks_bytes
    full_flops = cov_flops + sub_flops + scan_flops
    row = measure("full_pipeline_planes", full, (xr, xi), full_bytes,
                  full_flops)
    snaps = B / (row["ms_pipelined"] / 1e3)
    print(json.dumps({"stage": "headline_planes_entry",
                      "snapshots_per_s_pipelined": round(snaps, 1),
                      "x_realtime": round(snaps / (10e6 / SNAP), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
