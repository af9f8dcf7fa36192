"""Fused DoA pipelines: config → one jit-compiled function.

The reference runs a thread-per-block flowgraph (ingest → correct →
autocorrelate → MUSIC → peaks, SURVEY §3.1); here each configuration
compiles to ONE XLA program over the whole snapshot batch:

    samples c64[T, N] ─ calib correct ─ frame/chunk ─ R[B,N,N] ─ eigh ─
      spectra f32[B,G] per estimator ─ peaks (vals, locs)

XLA fuses the element-wise stages into the Grams/scans; pipeline
parallelism comes from async dispatch plus bounded multi-in-flight
blocks in io.stream.StreamingDriver, with optional input-buffer
donation (`build_pipeline_tpu(donate_inputs=True)`) so XLA reuses the
sample planes' HBM — not threads.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from doa_tpu.configs import AvgMethod, DoaConfig, Estimator
from doa_tpu.cpx import f32_matmuls
from doa_tpu.ops import covariance as cov_ops
from doa_tpu.ops import steering as steer_ops
from doa_tpu.ops.capon import capon_spectrum
from doa_tpu.ops.music import music_spectrum
from doa_tpu.ops.peaks import find_local_max
from doa_tpu.ops.root_music import root_music


@dataclasses.dataclass
class DoaResult:
    """Per-window outputs of one pipeline invocation (host-side view)."""

    spectra: Dict[str, jax.Array]        # estimator → f32[B, G]
    peak_values: Dict[str, jax.Array]    # estimator → f32[B, num_max_vals]
    peak_angles: Dict[str, jax.Array]    # estimator → f32[B, num_max_vals] deg
    root_music_angles: Optional[jax.Array] = None  # f32[B, K] deg
    esprit_angles: Optional[jax.Array] = None      # f32[B, K] deg
    unitary_esprit_angles: Optional[jax.Array] = None  # f32[B, K] deg
    covariance: Optional[jax.Array] = None         # c64[B, N', N']
    subspace_residual: Optional[jax.Array] = None  # f32[B] (guard mode)
    # Escalation observability (power path, detector armed): windows
    # the safety net fired on this call, and flagged windows beyond
    # subspace_escalate_capacity that stayed UNESCALATED (overflow > 0
    # at threshold SNR means raise the capacity).
    escalation_flagged: Optional[jax.Array] = None   # int32 scalar
    escalation_overflow: Optional[jax.Array] = None  # int32 scalar


def _steering_fn(cfg: DoaConfig):
    """→ A_fn(norm_spacing) → (G, N_eff) complex64 host steering matrix.

    Currying over spacing supports the wideband per-subband grids
    (ops.wideband), where electrical spacing stretches with frequency.
    """
    import dataclasses as _dc

    if cfg.geometry.kind == "ula":
        def A_fn(spacing):
            geo = _dc.replace(cfg.geometry, norm_spacing=spacing)
            return steer_ops.ula_grid(
                geo, cfg.grid, num_elements=cfg.effective_num_elements)
        return A_fn
    assert cfg.grid2d is not None, "ura geometry requires grid2d"

    def A_fn(spacing):
        geo = _dc.replace(cfg.geometry, norm_spacing=spacing)
        return steer_ops.ura_grid(geo, cfg.grid2d)
    return A_fn


def _steering_matrix(cfg: DoaConfig):
    """Precomputed scan steering matrix A: (G, N_eff) + (x_min, x_max)."""
    A = _steering_fn(cfg)(cfg.geometry.norm_spacing)
    if cfg.geometry.kind == "ula":
        return A, (cfg.grid.lo_deg, cfg.grid.hi_deg)
    # 2-D grids flatten az-major: bin → az index * num_el + el index.
    return A, (0.0, float(A.shape[0] - 1))


def compute_covariances(x, cfg: DoaConfig):
    """x: c64[T, N] → R: c64[B, N_eff, N_eff] per config windowing."""
    fb = cfg.avg_method == AvgMethod.FORWARD_BACKWARD
    R = cov_ops.cov_from_stream(x, cfg.snapshot_size, cfg.overlap,
                                fb_average=fb)
    if cfg.smoothing.enabled:
        R = cov_ops.spatial_smooth(R, cfg.smoothing.subarray_size)
    return R


def _spectra_and_peaks(R, A, cfg: DoaConfig, x_rng, refine: bool):
    spectra, pvals, pangs = {}, {}, {}
    is_2d = cfg.grid2d is not None and cfg.geometry.kind == "ura"
    for est in cfg.estimators:
        if est == Estimator.MUSIC:
            P = music_spectrum(R, A, cfg.num_sources)
        elif est == Estimator.CAPON:
            P = capon_spectrum(R, A, diag_load=cfg.capon_diag_load)
        elif est == Estimator.BARTLETT:
            from doa_tpu.ops.bartlett import bartlett_spectrum
            P = bartlett_spectrum(R, A)
        elif est == Estimator.MIN_NORM:
            from doa_tpu.ops.min_norm import min_norm_spectrum
            P = min_norm_spectrum(R, A, cfg.num_sources)
        elif est in (Estimator.ROOT_MUSIC, Estimator.ESPRIT,
                     Estimator.UNITARY_ESPRIT):
            continue  # grid-free; handled separately
        else:  # pragma: no cover
            raise ValueError(est)
        if is_2d:
            # Same (az, el)-degrees output as pipeline_tpu (never raw
            # flattened bin indices — identical units on both paths).
            from doa_tpu.ops.peaks import find_local_max_2d

            g2 = cfg.grid2d
            P2 = P.reshape(P.shape[0], g2.num_az, g2.num_el)
            v, az, el = find_local_max_2d(
                P2, cfg.num_max_vals,
                (g2.az_lo_deg, g2.az_hi_deg), (g2.el_lo_deg, g2.el_hi_deg),
                refine=refine)
            l = jnp.stack([az, el], axis=-1)
        else:
            v, l = find_local_max(P, cfg.num_max_vals, x_rng[0], x_rng[1],
                                  refine=refine)
        spectra[est.value] = P
        pvals[est.value] = v
        pangs[est.value] = l
    return spectra, pvals, pangs


def build_pipeline(cfg: DoaConfig, refine_peaks: bool = True,
                   return_covariance: bool = False):
    """→ jitted fn: (x: c64[T, N], correction: c64[N] | None) → DoaResult.

    `correction` is the per-channel complex calibration vector (reference
    antenna_correction × phase_correct_hier composed — calibration is data
    here, SURVEY §7.1); pass ones to disable.
    """
    A_host, x_rng = _steering_matrix(cfg)
    want_root = Estimator.ROOT_MUSIC in cfg.estimators
    bs = cfg.beamspace.enabled
    if bs:
        from doa_tpu.ops.beamspace import (beamspace_steering,
                                           dft_beam_matrix)
        Bm_host = dft_beam_matrix(
            cfg.geometry.num_elements, cfg.beamspace.num_beams,
            cfg.beamspace.center_deg, cfg.geometry.norm_spacing)
        A_host = beamspace_steering(A_host, Bm_host)

    @jax.jit
    @f32_matmuls
    def run(x, correction, A):
        x = x * correction[None, :]
        R = compute_covariances(x, cfg)
        if bs:
            from doa_tpu.ops.beamspace import beamspace_covariance
            R = beamspace_covariance(R, Bm_host)
        spectra, pvals, pangs = _spectra_and_peaks(
            R, A, cfg, x_rng, refine_peaks)
        root_angles = None
        if want_root:
            root_angles = root_music(
                R, cfg.num_sources, cfg.geometry.norm_spacing)
        esprit_angles = None
        if Estimator.ESPRIT in cfg.estimators:
            # Same grid-free path as pipeline_tpu (the split-complex ops
            # are the single implementation — wrap R's planes).
            from doa_tpu.cpx import Cpx
            Rc = Cpx(jnp.real(R), jnp.imag(R))
            if cfg.geometry.kind == "ula":
                from doa_tpu.ops.esprit import esprit_cpx
                esprit_angles = esprit_cpx(
                    Rc, cfg.num_sources, cfg.geometry.norm_spacing)
            else:
                from doa_tpu.ops.esprit import esprit_2d_cpx
                az, el = esprit_2d_cpx(
                    Rc, cfg.num_sources, cfg.geometry.norm_spacing,
                    cfg.geometry.shape)
                esprit_angles = jnp.stack([az, el], axis=-1)
        unitary_angles = None
        if Estimator.UNITARY_ESPRIT in cfg.estimators:
            from doa_tpu.cpx import Cpx
            from doa_tpu.ops.esprit import unitary_esprit_cpx
            unitary_angles = unitary_esprit_cpx(
                Cpx(jnp.real(R), jnp.imag(R)), cfg.num_sources,
                cfg.geometry.norm_spacing)
        return dict(
            spectra=spectra, peak_values=pvals, peak_angles=pangs,
            root_music_angles=root_angles,
            esprit_angles=esprit_angles,
            unitary_esprit_angles=unitary_angles,
            covariance=R if return_covariance else None,
        )

    A_dev = jax.device_put(A_host)  # resident scan matrix, reused per call

    def call(x, correction=None) -> DoaResult:
        x = jnp.asarray(x)
        if correction is None:
            correction = jnp.ones((x.shape[1],), dtype=x.dtype)
        out = run(x, jnp.asarray(correction), A_dev)
        return DoaResult(**out)

    call.jitted = run
    call.steering_matrix = A_dev
    call.config = cfg
    return call


def estimate_doa(x, cfg: DoaConfig, correction=None,
                 refine_peaks: bool = True) -> DoaResult:
    """One-shot convenience: build + run the pipeline for x: (T, N)."""
    return build_pipeline(cfg, refine_peaks=refine_peaks)(x, correction)
