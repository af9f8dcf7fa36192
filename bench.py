"""Benchmark entry point (driver-run on real TPU hardware).

Headline metric (BASELINE.json): Covariance + eigendecomposition + MUSIC
spectrum-scan snapshots/s per chip on a 16-element ULA, 1024-sample
snapshots, 1024-angle grid — the full pipeline over HBM-resident data.

The input is a PLANTED SCENE, not bare noise (r3 post-mortem,
docs/PERF.md): two equal-power 10 dB tones at 70°/110° in AWGN. That
makes the bench a hardware CORRECTNESS tripwire (the returned peak
angles are asserted to ≤0.5° per window — the r2 precision bug and any
silently-wrong kernel would fail here, not just slow down) AND it
measures the benign operating point the docs describe: source-free
noise drove the r3 escalation detector on every call (γ ≈ 1 in every
window) and regressed the headline 3×; a signal-bearing scene exercises
the detector's healthy no-fire path, and the r4 no-signal contract
(configs.subspace_escalate_signal_floor) fixed the noise-only case
itself.

Two fencing disciplines (docs/PERF.md):
  * pipelined (the headline): enqueue `iters` calls, fence once — device
    programs execute in launch order, so fetching the last output
    proves all completed. This is the steady-state streaming number;
    per-call dispatch (~25 ms through the axon relay on this container)
    amortizes away exactly as it does in production streaming.
  * latency: fence every call (reported on stderr for reference).

Measures the fused Pallas path first (interleaved ingest → E(R) kernel
→ warm-start subspace → packed scan) and falls back to the optimized
XLA path, then to a smaller batch. A repo-local persistent compilation
cache makes recompiles cheap across processes.

`vs_baseline` is the multiple of REAL-TIME at the north-star operating
point (10 Msps/channel → 9765.625 snapshots/s): ≥10 meets the target.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np

THETA = (70.0, 110.0)   # planted truth (the c4-like scene)
CYCLES = (5, 9)         # tone freqs, cycles per 1024 samples: phases are
#                         exact in f32 via t mod 1024, and the two tones
#                         are orthogonal over every snapshot window
SNR_DB = 10.0
PERIOD = 1024


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _mix_rows(N: int, spacing: float = 0.5):
    """Host-static mixing matrices mapping tone features
    [cos ω₁t, sin ω₁t, cos ω₂t, sin ω₂t] to array samples:
    x(t, n) = Σ_k amp·e^{jω_k t}·a_n(θ_k) →
    re = cos·a_re − sin·a_im, im = cos·a_im + sin·a_re.
    → (MixR (4, N), MixI (4, N)) f32."""
    from doa_tpu.ops.steering import _ula_steering_np

    a = _ula_steering_np(np.asarray(THETA, np.float64), N, spacing)
    amp = np.sqrt(2.0 * 10 ** (SNR_DB / 10.0))  # noise power = 2 (unit
    #                                             normal re/im planes)
    rows_re, rows_im = [], []
    for k in range(len(THETA)):
        ar = (a[k].real * amp).astype(np.float64)
        ai = (a[k].imag * amp).astype(np.float64)
        rows_re += [ar, -ai]
        rows_im += [ai, ar]
    return (np.stack(rows_re).astype(np.float32),
            np.stack(rows_im).astype(np.float32))


def _feature_consts(tp: int):
    """Per-column constants of the (rows, 4·tp) feature matrix for the
    interleaved layout: column c = 4p + j holds
    cos(ω_{k(j)}·(4r' + p) + sin-shift), r' = r mod PERIOD/tp."""
    w = 2.0 * np.pi * np.asarray(CYCLES, np.float64) / PERIOD
    k_c = np.tile([0, 0, 1, 1], tp)
    p_c = np.repeat(np.arange(tp), 4)
    is_sin = np.tile([0.0, 1.0, 0.0, 1.0], tp)
    colw = w[k_c]
    coloff = colw * p_c - is_sin * (np.pi / 2.0)  # cos(x−π/2) = sin x
    return (colw.astype(np.float32), coloff.astype(np.float32))


def _build(T: int, fused: bool, overrides=None):
    import jax
    import jax.numpy as jnp

    from doa_tpu.configs import (
        ArrayGeometry, DoaConfig, Estimator, GridSpec1D)
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    SNAP, N, GRID = 1024, 16, 1024
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=N,
                               norm_spacing=0.5),
        snapshot_size=SNAP, overlap=0, num_sources=2,
        estimators=(Estimator.MUSIC,), grid=GridSpec1D(num_points=GRID),
        num_max_vals=2,
        scan_mode="pallas" if fused else "dense",
        cov_impl="pallas" if fused else "xla",
        # e1 + MGS + warm start + escalation armed: exactly the
        # package default configuration.
        power_schedule="e1", power_iters=8)
    ingest_bf16 = ingest_int8 = False
    if overrides:
        # variant runs (exp_r5.py fastmode): same planted scene, same
        # angle assertion, knob changes only. "_ingest_bf16" casts the
        # resident interleaved buffer itself to bfloat16 — the input
        # read is the pipeline's bandwidth floor (docs/PERF.md), so
        # this is the knob that can cross it (an 8-bit-mantissa
        # capture ≈ any real ADC).
        import dataclasses
        overrides = dict(overrides)
        ingest_bf16 = overrides.pop("_ingest_bf16", False)
        ingest_int8 = overrides.pop("_ingest_int8", False)
        cfg = dataclasses.replace(cfg, **overrides)
    # Production streaming shape: peaks out, spectra stay on-device
    # (on the pallas path the spectrum never leaves VMEM at all).
    pipe = build_pipeline_tpu(cfg, return_spectra=False)
    Ar, Ai = pipe.steering_planes
    key = jax.random.key(0)
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    MixR, MixI = _mix_rows(N)
    hp = jax.lax.Precision.HIGHEST
    if fused and pipe.fast_path:
        tp = 128 // (2 * N)                      # 4 time steps per row
        Mix4 = np.zeros((4 * tp, 2 * N * tp), np.float32)
        ilv = np.empty((4, 2 * N), np.float32)
        ilv[:, 0::2] = MixR
        ilv[:, 1::2] = MixI
        for p in range(tp):
            Mix4[4 * p:4 * (p + 1), 2 * N * p:2 * N * (p + 1)] = ilv
        colw, coloff = _feature_consts(tp)

        @jax.jit
        def make_input(key):
            rows = T // tp
            r = jnp.arange(rows, dtype=jnp.int32) % (PERIOD // tp)
            rf = (tp * r).astype(jnp.float32)
            F4 = jnp.cos(rf[:, None] * jnp.asarray(colw)[None, :]
                         + jnp.asarray(coloff)[None, :])
            sig = jnp.einsum("rc,cd->rd", F4, jnp.asarray(Mix4),
                             precision=hp)
            return sig + jax.random.normal(key, (rows, 2 * N * tp),
                                           jnp.float32)

        xil = jax.block_until_ready(make_input(key))
        if ingest_bf16:
            xil = jax.block_until_ready(xil.astype(jnp.bfloat16))
        if ingest_int8:
            from doa_tpu.io.native import quantize_interleaved_int8
            xil = jax.block_until_ready(
                quantize_interleaved_int8(xil)[0])
        call = lambda: pipe.jitted_ilv(xil, cr, ci, Ar, Ai)  # noqa: E731
    else:
        kr, ki = jax.random.split(key)
        colw, coloff = _feature_consts(1)

        @jax.jit
        def make_planes(kr, ki):
            t = (jnp.arange(T, dtype=jnp.int32) % PERIOD).astype(
                jnp.float32)
            F = jnp.cos(t[:, None] * jnp.asarray(colw)[None, :]
                        + jnp.asarray(coloff)[None, :])   # (T, 4)
            xr = jnp.einsum("tc,cn->tn", F, jnp.asarray(MixR),
                            precision=hp) + jax.random.normal(
                                kr, (T, N), jnp.float32)
            xi = jnp.einsum("tc,cn->tn", F, jnp.asarray(MixI),
                            precision=hp) + jax.random.normal(
                                ki, (T, N), jnp.float32)
            return xr, xi

        xr, xi = jax.block_until_ready(make_planes(kr, ki))
        call = lambda: pipe.jitted(xr, xi, cr, ci, Ar, Ai)  # noqa: E731
    return call


def _check_angles(out):
    """Correctness tripwire: every window's sorted MUSIC peaks must hit
    the planted 70°/110° to ≤0.5° (they land ~0.01° off at 10 dB)."""
    ang = np.sort(np.asarray(out["peak_angles"]["music"]), axis=-1)
    err = np.abs(ang - np.asarray(THETA, np.float32)).max()
    _log(f"angle check: max |err| over {ang.shape[0]} windows = "
         f"{err:.4f} deg (truth {THETA})")
    if not np.isfinite(err) or err > 0.5:
        raise SystemExit(
            f"bench CORRECTNESS failure: planted sources {THETA} "
            f"estimated with max error {err:.3f} deg (> 0.5)")


def _run(T: int, fused: bool, overrides=None) -> float:
    import jax

    SNAP = 1024
    B = T // SNAP
    call = _build(T, fused, overrides)

    def fence(out):
        # On remote/async backends block_until_ready can return at
        # enqueue time; a device→host fetch is the only real fence.
        leaf = jax.tree_util.tree_leaves(out["peak_angles"])[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    _log(f"compiling + warming (fused={fused})")
    _check_angles(call())
    fence(call())

    _log("timing: latency-fenced")
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(call())
    lat = (time.perf_counter() - t0) / iters
    _log(f"latency-fenced: {B / lat:.0f} snapshots/s "
         f"({lat * 1e3:.1f} ms/call)")

    # Pipelined = enqueue N, fence once. The single ~25 ms relay fence
    # amortizes as 25/N ms/call, so N=16 (the r2/r3 discipline) still
    # carried ~1.6 ms/call of one-time fence in the "steady-state"
    # number. N=64 measures actual steady state (production drains
    # results asynchronously and fences ~never); the N=16 row is kept
    # on stderr for cross-round comparability. (docs/PERF.md.)
    dts = {}
    for iters in (16, 64):
        _log(f"timing: pipelined (N={iters})")
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = call()
        fence(out)
        dts[iters] = (time.perf_counter() - t0) / iters
        _log(f"pipelined N={iters}: {B / dts[iters]:.0f} snapshots/s "
             f"({dts[iters] * 1e3:.2f} ms/call)")
    return B / dts[64]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    SNAP = 1024
    snaps_per_s = None
    # Fused-first: the Pallas path (stacked cov kernel + warm-start
    # subspace + fused scan+peaks) is the measured-fastest on this
    # toolchain (docs/PERF.md); the XLA path is the fallback for
    # toolchains where the kernels don't compile.
    for T, fused in ((1 << 24, True), (1 << 24, False),
                     (1 << 22, False)):
        try:
            snaps_per_s = _run(T, fused)
            break
        except SystemExit:
            raise
        except Exception as e:
            _log(f"T=2^{T.bit_length() - 1} fused={fused} failed "
                 f"({type(e).__name__}: {str(e)[:200]}); falling back")
    if snaps_per_s is None:
        raise SystemExit("all bench configs failed")
    realtime = 10e6 / SNAP                  # snapshots/s at 10 Msps
    print(json.dumps({
        "metric": "cov_eigh_music_snapshots_per_s_per_chip_16el",
        "value": round(snaps_per_s, 1),
        "unit": "snapshots/s",
        "vs_baseline": round(snaps_per_s / realtime, 3),
    }))


if __name__ == "__main__":
    main()
