"""Parity tests for the fused wideband subband-scan + fusion kernel
(ops/pallas/wideband_scan.py) against the XLA lax.scan form in
ops.wideband.wideband_music_cpx — interpret mode on the CPU backend
(conftest)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                             GridSpec1D, WidebandSpec)
from doa_tpu.io import SourceSpec
from doa_tpu.io.synthetic import synth_wideband_ula_iq
from doa_tpu.ops.pallas.wideband_scan import wideband_fused_spectrum_pallas
from doa_tpu.pipeline_tpu import build_pipeline_tpu


def _xla_fusion(V, At):
    """Reference fusion: mean over subbands of max-normalized
    reciprocal spectra (the wideband_music_cpx power-path formula)."""
    nrm = np.sum(At * At, axis=-1)                      # (F, G)
    Y = np.einsum("fgn,fbnk->fbgk", At, V)
    den = np.maximum(nrm[:, None, :] - np.sum(Y * Y, -1),
                     np.finfo(np.float32).tiny)
    P = 1.0 / den
    P = P / P.max(axis=-1, keepdims=True)
    return P.mean(axis=0)


def test_fused_spectrum_matches_xla_formula():
    rng = np.random.default_rng(0)
    F, B, n2, k2, G = 4, 10, 16, 4, 157
    Vr = rng.standard_normal((F, B, n2, k2)).astype(np.float32)
    # orthonormalize columns per window (the production V contract)
    V = np.linalg.qr(Vr)[0].astype(np.float32)
    At = rng.standard_normal((F, G, n2)).astype(np.float32)
    out = wideband_fused_spectrum_pallas(
        jnp.asarray(V), jnp.asarray(At), block_b=8, interpret=True)
    ref = _xla_fusion(V, At)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                               atol=2e-4)


def test_wb_fusion_impl_pipeline_parity():
    """The full wideband pipeline with wb_fusion_impl='pallas' must
    match the XLA-fusion default (spectrum + peaks)."""
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=8,
                               norm_spacing=0.5),
        snapshot_size=256, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=128),
        wideband=WidebandSpec(num_subbands=8, fractional_bw=0.1),
        num_max_vals=2, cov_impl="pallas")
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=62.0, freq_norm=0.0, bandwidth_norm=0.5),
         SourceSpec(theta_deg=117.0, freq_norm=0.0,
                    bandwidth_norm=0.5)],
        8, 0.5, 16 * 1024, snr_db=12, seed=7,
        fractional_bw=0.1).astype(np.complex64)
    ref = build_pipeline_tpu(cfg)(x)
    out = build_pipeline_tpu(
        dataclasses.replace(cfg, wb_fusion_impl="pallas"))(x)
    np.testing.assert_allclose(np.asarray(out.spectra["music"]),
                               np.asarray(ref.spectra["music"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.sort(np.asarray(out.peak_angles["music"]), -1),
        np.sort(np.asarray(ref.peak_angles["music"]), -1), atol=5e-3)


def test_sharded_ep_fusion_kernel_parity():
    """The fusion kernel under shard_map (per-device partial fusion
    over LOCAL subbands, psum across the EP axis) must match the
    vmap+psum sharded path and the single-device pipeline."""
    from doa_tpu.parallel import (MeshSpec, build_sharded_pipeline,
                                  make_mesh)

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=8,
                               norm_spacing=0.5),
        snapshot_size=256, num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=128),
        wideband=WidebandSpec(num_subbands=8, fractional_bw=0.1),
        num_max_vals=2, cov_impl="pallas")
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=62.0, freq_norm=0.0, bandwidth_norm=0.5),
         SourceSpec(theta_deg=117.0, freq_norm=0.0,
                    bandwidth_norm=0.5)],
        8, 0.5, 16 * 1024, snr_db=12, seed=7,
        fractional_bw=0.1).astype(np.complex64)
    mesh = make_mesh(MeshSpec(4, 2))
    pipe_k = build_sharded_pipeline(
        dataclasses.replace(cfg, wb_fusion_impl="pallas"), mesh)
    assert pipe_k.fast
    out_k = pipe_k(x)
    out_v = build_sharded_pipeline(
        dataclasses.replace(cfg, wb_fusion_impl="xla"), mesh)(x)
    np.testing.assert_allclose(np.asarray(out_k["spectrum_music"]),
                               np.asarray(out_v["spectrum_music"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_k["peak_angles_music"]),
        np.asarray(out_v["peak_angles_music"]), atol=5e-3)
    ref = build_pipeline_tpu(cfg)(x)
    np.testing.assert_allclose(
        np.sort(np.asarray(out_k["peak_angles_music"]), -1),
        np.sort(np.asarray(ref.peak_angles["music"]), -1), atol=0.05)
