"""exp_r5.py — round-5 hardware measurements (VERDICT r4 items 2/3/4/6).

Stages (arg = stage name; ONE at a time on TPU):
  frontend — c5 wb_fast front-end attribution: the fft kernel's
             chunks_per_block sweep (the auto-picker lands at cb=2;
             bigger blocks amortize the planarize/FFT op-issue cost —
             the hypothesis for the 13.2 ms vs 6.4 ms "DMA floor" gap
             is op latency, not DMA), + the embedded variant row.
  fusion   — the NEW fused subband-scan+fusion kernel
             (ops/pallas/wideband_scan.py) standalone at the c5 shape
             vs the XLA lax.scan form (r4 measured 21.4 ms; kernel
             bound ~17 ms: 2 passes x 3 hi/lo dots, den in VMEM).
  c5       — full c5 pipeline, MEDIAN-OF-3 rows (r4 weak #1):
             default / wb_fusion_impl=pallas / best frontend knobs.
  esc      — escalation fire-path tax at production scale (r4 weak
             #4): headline-shape subspace stage with 0 / 1 / capacity
             flagged windows.
  fastmode — bf16-ingest fast mode at the HEADLINE shape (r2 stretch):
             bench.py's planted-scene pipeline with cov_dtype=bfloat16
             + compute_dtype=bfloat16, angle assertion kept.
Run: timeout 1500 python exp_r5.py <stage>
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


def _capture_c5(T):
    from doa_tpu.io.synthetic import SourceSpec, synth_wideband_ura_iq
    return synth_wideband_ura_iq(
        [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.0,
                    bandwidth_norm=0.5),
         SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.0,
                    bandwidth_norm=0.5)],
        (8, 8), 0.5, T, fractional_bw=0.1, snr_db=10,
        seed=0).astype(np.complex64)


def stage_frontend():
    import jax
    import jax.numpy as jnp
    from doa_tpu.ops.pallas.wideband_cov import (
        channelizer_matrix, wideband_cov_embedded_pallas)

    B, F, N, S = 2048, 16, 64, 1024
    x = _capture_c5(B * S)
    T = x.shape[0]
    xil = jax.device_put(
        np.ascontiguousarray(x).view(np.float32).reshape(T, 2 * N))
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    Kd = jax.device_put(channelizer_matrix(F, N))

    ref = None
    for variant, cbs in (("fft", (None, 4, 8, 16)),
                         ("embedded", (None, 4))):
        for cb in cbs:
            label = f"{variant} cb={cb or 'auto'}"
            try:
                fn = jax.jit(lambda xi, k, a, b, _cb=cb, _v=variant:
                             wideband_cov_embedded_pallas(
                                 xi, k, a, b, N=N, F=F,
                                 snapshot_size=S, chunks_per_block=_cb,
                                 variant=_v))
                _log(f"compiling frontend {label} …")
                dt = _time(lambda: fn(xil, Kd, cr, ci))
                out = fn(xil, Kd, cr, ci)
                if ref is None:
                    ref = np.asarray(out[:, :4])
                    err = 0.0
                else:
                    err = float(np.max(np.abs(np.asarray(out[:, :4])
                                              - ref)))
                _log(f"  frontend {label}: {dt*1e3:.2f} ms "
                     f"(parity vs first row: {err:.2e})")
            except Exception as e:
                _log(f"  frontend {label}: FAILED "
                     f"({type(e).__name__}: {str(e)[:160]})")


def stage_fusion():
    import jax
    import jax.numpy as jnp
    from doa_tpu.configs import PRESETS
    from doa_tpu.cpx import Cpx
    from doa_tpu.ops import cpx_ops
    from doa_tpu.ops.pallas.wideband_scan import (
        wideband_fused_spectrum_pallas)
    from doa_tpu.ops.wideband import wideband_steering_stack
    from doa_tpu.pipeline import _steering_fn

    cfg = PRESETS["c5_ura64_wideband"]
    B, F, N = 2048, 16, 64
    n2, k2 = 2 * N, 4
    G = cfg.grid2d.num_az * cfg.grid2d.num_el
    rng = np.random.default_rng(0)
    Vh = rng.standard_normal((F, B, n2, k2)).astype(np.float32)
    Vh = np.linalg.qr(Vh)[0]            # orthonormal per-window columns
    V = jax.device_put(np.ascontiguousarray(Vh.astype(np.float32)))
    A_host = wideband_steering_stack(cfg, _steering_fn(cfg))
    Ar = jax.device_put(A_host.real.astype(np.float32))
    Ai = jax.device_put(A_host.imag.astype(np.float32))
    At = jnp.concatenate([Ar, Ai], axis=-1)          # (F, G, 2N)

    def scan_xla(V, Ar, Ai):
        def step(acc, vA):
            v, ar, ai = vA
            den = jnp.maximum(cpx_ops.music_denominator_subspace(
                v, Cpx(ar, ai)), 0.0)
            P = 1.0 / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
            return acc + P / jnp.max(P, axis=-1, keepdims=True), None
        acc0 = jnp.zeros((B, G), jnp.float32)
        return jax.lax.scan(step, acc0, (V, Ar, Ai))[0] / F

    from doa_tpu.cpx import f32_matmuls
    jx = jax.jit(f32_matmuls(scan_xla))
    _log("compiling XLA scan+fusion …")
    dt_x = _time(lambda: jx(V, Ar, Ai))
    _log(f"  scan+fusion XLA (r4 baseline): {dt_x*1e3:.2f} ms")

    for bb in (128, 64, 256):
        try:
            jk = jax.jit(lambda v, a, _bb=bb:
                         wideband_fused_spectrum_pallas(
                             v, a, block_b=_bb))
            _log(f"compiling fused kernel block_b={bb} …")
            dt_k = _time(lambda: jk(V, At))
            P_k = np.asarray(jk(V, At))
            P_x = np.asarray(jx(V, Ar, Ai))
            err = np.max(np.abs(P_k - P_x))
            _log(f"  scan+fusion Pallas bb={bb}: {dt_k*1e3:.2f} ms "
                 f"(|delta| max vs XLA {err:.2e})")
        except Exception as e:
            _log(f"  scan+fusion Pallas bb={bb}: FAILED "
                 f"({type(e).__name__}: {str(e)[:160]})")


def _c5_call(cfg, x):
    import jax
    import jax.numpy as jnp
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    N = 64
    T = x.shape[0]
    pipe = build_pipeline_tpu(cfg, return_spectra=False)
    assert pipe.wb_fast
    xil = jax.device_put(
        np.ascontiguousarray(x).view(np.float32).reshape(T, 2 * N))
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    Ar, Ai = pipe.steering_planes
    wbi = pipe.wb_ilv_args
    return lambda: pipe.jitted_ilv(xil, cr, ci, Ar, Ai, *wbi)


def stage_c5():
    B = 2048
    cfg0 = dataclasses.replace(
        __import__("doa_tpu.configs", fromlist=["PRESETS"]).PRESETS[
            "c5_ura64_wideband"], cov_impl="pallas")
    x = _capture_c5(B * cfg0.snapshot_size)
    rows = [("default (r4 composition)", cfg0),
            ("wb_fusion_impl=pallas", dataclasses.replace(
                cfg0, wb_fusion_impl="pallas")),
            ("bf16 front-end + bf16 scan (opt-in fast mode)",
             dataclasses.replace(cfg0, cov_dtype="bfloat16",
                                 compute_dtype="bfloat16")),
            ("bf16 front-end + f32 pallas fusion (combined)",
             dataclasses.replace(cfg0, cov_dtype="bfloat16",
                                 wb_fusion_impl="pallas"))]
    for label, cfg in rows:
        try:
            call = _c5_call(cfg, x)
            _log(f"compiling c5 {label} …")
            dts = []
            _fence(call())          # compile + warm
            for _ in range(3):
                dts.append(_time(call, iters=8, warm=1))
            med = sorted(dts)[1]
            _log(f"  c5 {label}: median-of-3 {med*1e3:.2f} ms "
                 f"(runs {[round(d*1e3, 2) for d in dts]}; "
                 f"{B/med:.0f} snapshots/s, {B/med/9765.6:.2f}x RT)")
            out = call()
            ang = np.asarray(out["peak_angles"]["music"])
            med_ang = np.median(ang.reshape(-1, 2, 2), axis=0)
            _log(f"  median (az, el) pairs: {med_ang.tolist()}")
        except Exception as e:
            _log(f"  c5 {label}: FAILED "
                 f"({type(e).__name__}: {str(e)[:200]})")


def stage_esc():
    """Escalation fire-path cost at the headline shape (B=16384,
    2N=32): warm path (3 applies + detector) with 0 / 1 / capacity
    flagged windows — pins the lax.top_k + gather + 40-round compact-
    batch tax when the safety net DOES fire."""
    import jax
    import jax.numpy as jnp
    from doa_tpu.ops import cpx_ops

    B, n2, K = 16384, 32, 2
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((n2, n2)).astype(np.float64))

    def planted(n_bad, cap=1024):
        healthy = np.array([100.0, 100.0, 50.0, 50.0]
                           + [0.1] * (n2 - 4))
        bad = np.array([100.0, 100.0, 0.14, 0.14] + [0.1] * (n2 - 4))
        lams = np.tile(healthy, (B, 1))
        if n_bad:
            lams[:n_bad] = bad
        E = np.einsum("ij,bj,kj->bik", Q, lams, Q).astype(np.float32)
        return jax.device_put(E)

    init_h = np.linalg.qr(
        rng.standard_normal((n2, 2 * K)).astype(np.float64))[0].T
    init = jnp.broadcast_to(
        jnp.asarray(init_h.astype(np.float32))[None], (B, 2 * K, n2))

    fn = jax.jit(lambda e: cpx_ops.signal_subspace_from_E_T(
        e, K, iters=3, init=init, escalate_extra=40,
        return_stats=True))
    for n_bad, label in ((0, "no flags (benign steady state)"),
                         (1, "1-of-16384 flagged"),
                         (1024, "capacity-full (1024 flagged)"),
                         (4096, "overflow (4096 flagged, cap 1024)")):
        E = planted(n_bad)
        _log(f"compiling/warming esc {label} …")
        dt = _time(lambda: fn(E))
        _, (fl, ov) = fn(E)
        _log(f"  esc {label}: {dt*1e3:.2f} ms "
             f"(flagged={int(fl)}, overflow={int(ov)})")


def stage_fastmode():
    """bf16-ingest fast mode at the headline shape — the r2 2.5M
    stretch question, measured with the planted-scene angle assertion
    kept ON (bench.py discipline)."""
    import bench
    rows = {}
    _log("=== f32 reference (bench default) ===")
    rows["f32"] = bench._run(1 << 24, True)
    _log("=== bf16 Gram (cov_dtype=bfloat16, f32 ingest) ===")
    rows["bf16_gram"] = bench._run(
        1 << 24, True, {"cov_dtype": "bfloat16"})
    _log("=== bf16 INGEST (bf16 resident buffer + bf16 Gram) ===")
    rows["bf16_ingest"] = bench._run(
        1 << 24, True, {"cov_dtype": "bfloat16", "_ingest_bf16": True})
    for k, v in rows.items():
        _log(f"fastmode {k}: {v:.0f} snapshots/s "
             f"({v/9765.6:.1f}x real-time)")


def stage_sharded1():
    """Per-device work of the SHARDED program on the real chip
    (VERDICT r4 missing #1 'done' criterion): the shard_map pipeline
    on a (1,1) mesh at the headline shape must now run at the fused
    single-chip program's rate (~8.5 ms/call), not the ~29 ms XLA
    composition it used through r4. Input is device-resident noise
    (detector no-fire; throughput row, not an accuracy row — bench.py
    carries the planted-scene assertion)."""
    import jax
    import jax.numpy as jnp
    from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                                 GridSpec1D)
    from doa_tpu.parallel import (MeshSpec, build_sharded_pipeline,
                                  make_mesh)

    SNAP, N, GRID = 1024, 16, 1024
    T = 1 << 24
    B = T // SNAP
    base = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=N,
                               norm_spacing=0.5),
        snapshot_size=SNAP, overlap=0, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=GRID), num_max_vals=2)
    mesh = make_mesh(MeshSpec(n_snap=1, n_grid=1), jax.devices()[:1])
    key = jax.random.key(0)
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)

    for label, cfg in (
            ("fast (fused per-device program, r5)",
             dataclasses.replace(base, cov_impl="pallas")),
            ("xla (the r4 sharded composition)",
             dataclasses.replace(base, cov_impl="xla"))):
        pipe = build_sharded_pipeline(cfg, mesh, return_spectra=False)
        Ar_d, Ai_d = pipe.steering_planes
        if pipe.fast:
            tp = 128 // (2 * N)
            xin = jax.block_until_ready(jax.random.normal(
                key, (T // tp, 2 * N * tp), jnp.float32))
            call = lambda: pipe.jitted(xin, cr, ci, Ar_d, Ai_d)  # noqa
        else:
            xr = jax.random.normal(key, (T, N), jnp.float32)
            xi = jax.random.normal(jax.random.key(1), (T, N),
                                   jnp.float32)
            jax.block_until_ready((xr, xi))
            call = lambda: pipe.jitted(xr, xi, cr, ci, Ar_d, Ai_d)  # noqa
        _log(f"compiling sharded1 {label} …")

        def fence(out):
            np.asarray(jax.device_get(
                out["peak_angles_music"].ravel()[:1]))

        fence(call())
        for iters in (16, 64):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = call()
            fence(out)
            dt = (time.perf_counter() - t0) / iters
            _log(f"  sharded1 {label} N={iters}: {dt*1e3:.2f} ms/call "
                 f"({B/dt:.0f} snapshots/s)")


STAGES = {"frontend": stage_frontend, "fusion": stage_fusion,
          "c5": stage_c5, "esc": stage_esc, "fastmode": stage_fastmode,
          "sharded1": stage_sharded1}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which not in STAGES:
        _log(f"usage: python exp_r5.py {{{'|'.join(STAGES)}}}")
        raise SystemExit(2)
    _log(f"=== stage {which} ===")
    STAGES[which]()


if __name__ == "__main__":
    main()
