"""Sharded DoA pipeline under `jax.shard_map` (SURVEY §7.2 M5).

Layout (mesh axes from doa_tpu.parallel.mesh):

    x: c64[T, N]      → P("snap", None)   time axis across devices
    A: c64[G, N_eff]  → P("grid", None)   steering grid across devices
    out peaks         → P("snap", None)   window batch follows time shards

Per device: halo-exchange `overlap` samples from the right time-neighbor
(`lax.ppermute`), frame/chunk locally, covariance+eigh for the windows that
START in the local block, scan the LOCAL angle block, `all_gather` the
spectrum row over "grid" for peak extraction. Windows at the global tail
whose halo wrapped past the end are invalid; callers slice to
`num_valid_windows(T, cfg)`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from doa_tpu.configs import AvgMethod, DoaConfig, Estimator
from doa_tpu.ops import covariance as cov_ops
from doa_tpu.ops.capon import capon_spectrum
from doa_tpu.ops.music import music_spectrum
from doa_tpu.ops.peaks import find_local_max
from doa_tpu.parallel.mesh import GRID_AXIS, SNAP_AXIS
from doa_tpu.pipeline import _steering_matrix


def num_valid_windows(T: int, cfg: DoaConfig) -> int:
    """Global window count for a T-sample capture (windows fully inside)."""
    S, hop = cfg.snapshot_size, cfg.hop
    return 0 if T < S else (T - S) // hop + 1


def _halo_exchange(x_local, overlap: int, axis_name: str):
    """Receive the first `overlap` rows of the RIGHT neighbor's block
    (appended to the local block so boundary-crossing windows are whole).
    The last shard receives zeros — its tail windows are invalid anyway."""
    n = jax.lax.axis_size(axis_name)
    if overlap == 0 or n == 1:
        return x_local
    head = x_local[:overlap]
    # perm (src → dst): device i+1 sends to device i.
    perm = [(i + 1, i) for i in range(n - 1)]
    halo = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([x_local, halo], axis=0)


def build_sharded_pipeline(cfg: DoaConfig, mesh: Mesh,
                           refine_peaks: bool = True):
    """→ jitted fn(x: c64[T, N], correction: c64[N]) → dict of sharded
    outputs. T must be divisible by (n_snap * hop); windows are produced
    for every hop-aligned start, callers slice to num_valid_windows."""
    A_host, x_rng = _steering_matrix(cfg)
    S, hop, overlap = cfg.snapshot_size, cfg.hop, cfg.overlap
    fb = cfg.avg_method == AvgMethod.FORWARD_BACKWARD
    # Halo = S - hop = overlap samples from the right neighbor: the latest
    # window starting in a block of Tl samples begins at Tl - hop and ends
    # at Tl - hop + S = Tl + overlap.
    n_grid = mesh.shape[GRID_AXIS]
    G = A_host.shape[0]
    if G % n_grid:
        raise ValueError(f"grid size {G} not divisible by n_grid {n_grid}")

    def shard_fn(x_local, correction, A_local):
        x_local = x_local * correction[None, :]
        x_ext = _halo_exchange(x_local, overlap, SNAP_AXIS)
        R = cov_ops.cov_from_stream(x_ext, S, overlap, fb_average=fb)
        if cfg.smoothing.enabled:
            R = cov_ops.spatial_smooth(R, cfg.smoothing.subarray_size)
        out = {}
        for est in cfg.estimators:
            if est == Estimator.MUSIC:
                P_loc = music_spectrum(R, A_local, cfg.num_sources,
                                       normalize=False)
            elif est == Estimator.CAPON:
                P_loc = capon_spectrum(R, A_local,
                                       diag_load=cfg.capon_diag_load,
                                       normalize=False)
            else:
                continue
            # TP: gather the full spectrum row for normalization + peaks.
            P_full = jax.lax.all_gather(
                P_loc, GRID_AXIS, axis=1, tiled=True)
            P_full = P_full / jnp.max(P_full, axis=-1, keepdims=True)
            v, l = find_local_max(P_full, cfg.num_max_vals, x_rng[0],
                                  x_rng[1], refine=refine_peaks)
            out[f"spectrum_{est.value}"] = P_full
            out[f"peak_values_{est.value}"] = v
            out[f"peak_angles_{est.value}"] = l
        return out

    out_specs = {}
    for est in cfg.estimators:
        if est in (Estimator.MUSIC, Estimator.CAPON):
            out_specs[f"spectrum_{est.value}"] = P(SNAP_AXIS, None)
            out_specs[f"peak_values_{est.value}"] = P(SNAP_AXIS, None)
            out_specs[f"peak_angles_{est.value}"] = P(SNAP_AXIS, None)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(SNAP_AXIS, None), P(), P(GRID_AXIS, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    A_dev = jax.device_put(
        A_host, NamedSharding(mesh, P(GRID_AXIS, None)))

    def call(x, correction=None):
        x = jnp.asarray(x)
        n_snap = mesh.shape[SNAP_AXIS]
        if x.shape[0] % (n_snap * hop):
            raise ValueError(
                f"T={x.shape[0]} must be divisible by n_snap*hop="
                f"{n_snap * hop}")
        if correction is None:
            correction = jnp.ones((x.shape[1],), dtype=x.dtype)
        x = jax.device_put(x, NamedSharding(mesh, P(SNAP_AXIS, None)))
        return jitted(x, jnp.asarray(correction), A_dev)

    call.jitted = jitted
    call.mesh = mesh
    return call


def distributed_covariance(mesh: Mesh):
    """→ jitted fn(x: c64[T, N]) → R: c64[N, N] — ONE covariance over the
    whole (time-sharded) capture: local chunk Grams + `psum` over the snap
    axis. The calibration-at-scale primitive (partial sums over ICI instead
    of gathering 1.28 GB/s of samples to one host)."""

    def shard_fn(x_local):
        C = jnp.einsum(
            "si,sj->ij", x_local, x_local.conj(),
            preferred_element_type=jnp.complex64)
        C = jax.lax.psum(C, SNAP_AXIS)
        # total sample count = local * n_snap (uniform shards)
        total = x_local.shape[0] * jax.lax.axis_size(SNAP_AXIS)
        return C / total

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(SNAP_AXIS, None),),
        out_specs=P(),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def call(x):
        x = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(SNAP_AXIS, None)))
        return jitted(x)

    return call
