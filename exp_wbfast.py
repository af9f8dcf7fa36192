"""exp_wbfast.py — c5 wideband fast path on hardware.

Stages (arg = stage name; default "all"):
  kernel   — standalone channelize + multi-subband Gram kernel sweep
             (sb_group, chunks_per_block) at the c5 shape
  pipe     — full c5 pipeline: wb_fast vs XLA planes path, pipelined +
             latency fencing, angle parity on a synthetic capture
Run on TPU: timeout 590 python exp_wbfast.py kernel (etc.)
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


def stage_kernel():
    import jax
    import jax.numpy as jnp
    from doa_tpu.ops.pallas.wideband_cov import (
        channelize_frames, channelizer_matrix, subband_grams_pallas,
        wideband_cov_embedded_pallas)

    N, F, S = 64, 16, 1024
    B = 2048
    T = B * S                      # 2**21
    tp = 1
    rng = np.random.default_rng(0)
    xil = jax.device_put(
        rng.standard_normal((T, 2 * N)).astype(np.float32))
    K = jax.device_put(channelizer_matrix(F, N))
    chan = jax.jit(lambda x: channelize_frames(x, K, F, N, tp))
    dt = _time(lambda: chan(xil))
    _log(f"channelize (dense matmul): {dt*1e3:.2f} ms")
    Y = chan(xil)
    Y.block_until_ready()
    g = 64                          # gcd(S_sub=64, hop_sub=64)
    for sbg in (1, 2, 4):
        for cb in (None, 4, 8, 16):
            try:
                dt = _time(lambda: subband_grams_pallas(
                    Y, F=F, N=N, g=g, sb_group=sbg,
                    chunks_per_block=cb))
                _log(f"grams sb_group={sbg} cb={cb}: {dt*1e3:.2f} ms")
            except Exception as e:
                _log(f"grams sb_group={sbg} cb={cb}: FAIL "
                     f"{type(e).__name__}: {str(e)[:120]}")
    from doa_tpu.ops.pallas.wideband_cov import subband_embedded_pallas
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    for cb in (None, 2, 4):
        try:
            dt = _time(lambda: subband_embedded_pallas(
                Y, cr, ci, F=F, N=N, g=g, scale=1.0 / (S // F),
                chunks_per_block=cb))
            _log(f"embedded-emit kernel cb={cb}: {dt*1e3:.2f} ms")
        except Exception as e:
            _log(f"embedded-emit kernel cb={cb}: FAIL "
                 f"{type(e).__name__}: {str(e)[:120]}")
    for variant in ("fft", "embedded", "uhat"):
        try:
            dt = _time(lambda: wideband_cov_embedded_pallas(
                xil, K, cr, ci, N=N, F=F, snapshot_size=S,
                variant=variant))
            _log(f"full wideband cov front-end [{variant}]: "
                 f"{dt*1e3:.2f} ms")
        except Exception as e:
            _log(f"front-end [{variant}]: FAIL {type(e).__name__}: "
                 f"{str(e)[:160]}")
    # fft-variant numeric check vs embedded on hardware (value-carrying
    # precision paths differ: VPU f32 butterflies vs tf32 dense matmul)
    E1 = np.asarray(wideband_cov_embedded_pallas(
        xil, K, cr, ci, N=N, F=F, snapshot_size=S, variant="fft"))
    E2 = np.asarray(wideband_cov_embedded_pallas(
        xil, K, cr, ci, N=N, F=F, snapshot_size=S, variant="embedded"))
    _log(f"fft vs embedded max rel err: "
         f"{np.max(np.abs(E1 - E2)) / np.max(np.abs(E2)):.2e}")


def stage_pipe():
    import jax
    import jax.numpy as jnp
    from doa_tpu.configs import PRESETS
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = PRESETS["c5_ura64_wideband"]
    N = 64
    B = 2048
    T = B * cfg.snapshot_size
    # structured capture so parity is meaningful (two wideband sources)
    from doa_tpu.io.synthetic import SourceSpec, synth_wideband_ura_iq
    x = synth_wideband_ura_iq(
        [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.0,
                    bandwidth_norm=0.5),
         SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.0,
                    bandwidth_norm=0.5)],
        (8, 8), 0.5, T, fractional_bw=0.1, snr_db=10,
        seed=0).astype(np.complex64)
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)

    pipe_f = build_pipeline_tpu(
        dataclasses.replace(cfg, cov_impl="pallas"),
        return_spectra=False)
    assert pipe_f.wb_fast, "wb_fast gate did not engage"
    xil = jax.device_put(
        np.ascontiguousarray(x).view(np.float32).reshape(T, 2 * N))
    Ar, Ai = pipe_f.steering_planes
    wbi = pipe_f.wb_ilv_args
    call_f = lambda: pipe_f.jitted_ilv(    # noqa: E731
        xil, cr, ci, Ar, Ai, *wbi)
    _log("compiling fast path…")
    dt_f = _time(call_f)
    _log(f"c5 wb_fast pipelined: {dt_f*1e3:.2f} ms/call "
         f"({B/dt_f:.0f} snapshots/s)")
    t0 = time.perf_counter()
    for _ in range(4):
        _fence(call_f())
    _log(f"c5 wb_fast latency:   "
         f"{(time.perf_counter()-t0)/4*1e3:.2f} ms/call")
    out_f = call_f()
    ang_f = np.asarray(out_f["peak_angles"]["music"])

    pipe_x = build_pipeline_tpu(
        dataclasses.replace(cfg, cov_impl="xla"), return_spectra=False)
    xr = jax.device_put(np.ascontiguousarray(x.real))
    xi = jax.device_put(np.ascontiguousarray(x.imag))
    Ax = pipe_x.steering_planes
    call_x = lambda: pipe_x.jitted(        # noqa: E731
        xr, xi, cr, ci, Ax[0], Ax[1], *pipe_x.wb_args)
    _log("compiling XLA path…")
    dt_x = _time(call_x)
    _log(f"c5 XLA planes pipelined: {dt_x*1e3:.2f} ms/call "
         f"({B/dt_x:.0f} snapshots/s)")
    ang_x = np.asarray(call_x()["peak_angles"]["music"])
    err = np.max(np.abs(ang_f - ang_x))
    _log(f"angle parity |fast - xla| max: {err:.5f} deg")
    med = np.median(ang_f.reshape(-1, 2, 2), axis=0)
    _log(f"fast-path median (az, el): {med}")


def stage_bf16():
    """c5 with the opt-in bf16 scan (compute_dtype) on the fast path."""
    import jax
    import jax.numpy as jnp
    from doa_tpu.configs import PRESETS
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = PRESETS["c5_ura64_wideband"]
    N, B = 64, 2048
    T = B * cfg.snapshot_size
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((T, N))
         + 1j * rng.standard_normal((T, N))).astype(np.complex64)
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    pipe = build_pipeline_tpu(
        dataclasses.replace(cfg, cov_impl="pallas",
                            compute_dtype="bfloat16"),
        return_spectra=False)
    xil = jax.device_put(
        np.ascontiguousarray(x).view(np.float32).reshape(T, 2 * N))
    Ar, Ai = pipe.steering_planes
    dt = _time(lambda: pipe.jitted_ilv(xil, cr, ci, Ar, Ai,
                                       *pipe.wb_ilv_args))
    _log(f"c5 wb_fast bf16-scan pipelined: {dt*1e3:.2f} ms/call "
         f"({B/dt:.0f} snapshots/s)")


def stage_warm():
    """c5 with warm-started per-window subspaces (+ angle check vs
    cold on a structured capture)."""
    import jax
    import jax.numpy as jnp
    from doa_tpu.configs import PRESETS
    from doa_tpu.io.synthetic import SourceSpec, synth_wideband_ura_iq
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    cfg = PRESETS["c5_ura64_wideband"]
    N, B = 64, 2048
    T = B * cfg.snapshot_size
    x = synth_wideband_ura_iq(
        [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.0,
                    bandwidth_norm=0.5),
         SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.0,
                    bandwidth_norm=0.5)],
        (8, 8), 0.5, T, fractional_bw=0.1, snr_db=10,
        seed=0).astype(np.complex64)
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    xil = jax.device_put(
        np.ascontiguousarray(x).view(np.float32).reshape(T, 2 * N))
    angs = {}
    for warm in (True, False):
        pipe = build_pipeline_tpu(
            dataclasses.replace(cfg, cov_impl="pallas",
                                subspace_warm_start=warm),
            return_spectra=False)
        Ar, Ai = pipe.steering_planes
        call = lambda: pipe.jitted_ilv(   # noqa: E731
            xil, cr, ci, Ar, Ai, *pipe.wb_ilv_args)
        dt = _time(call)
        _log(f"c5 wb_fast warm={warm}: {dt*1e3:.2f} ms/call "
             f"({B/dt:.0f} snapshots/s)")
        angs[warm] = np.asarray(call()["peak_angles"]["music"])
    err = np.max(np.abs(angs[True] - angs[False]))
    _log(f"warm vs cold angle |diff| max: {err:.4f} deg")
    _log(f"warm median: {np.median(angs[True].reshape(-1, 2, 2), 0)}")


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("kernel", "all"):
        stage_kernel()
    if stage in ("pipe", "all"):
        stage_pipe()
    if stage == "bf16":
        stage_bf16()
    if stage == "warm":
        stage_warm()
