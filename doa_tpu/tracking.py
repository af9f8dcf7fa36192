"""Sliding-window DoA tracking of moving emitters (BASELINE config 4).

Not in upstream gr-doa (its GUI just replots the spectrum); required by the
north-star. A batch of per-window peak detections f32[B, K] is associated
to persistent tracks with an alpha-beta filter inside one `lax.scan` —
the whole track history for a capture computes on-device in a single jit,
no per-window host round-trips.

Algorithm per window: predict each active track (constant-velocity),
greedily match tracks to the nearest unused detection within `gate_deg`,
alpha-beta update matched tracks, age out tracks missing > `max_missed`
windows, spawn new tracks from unmatched detections.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TrackState(NamedTuple):
    angle: jax.Array    # f32[M] current angle estimate (deg)
    vel: jax.Array      # f32[M] deg/window
    active: jax.Array   # bool[M]
    missed: jax.Array   # i32[M] consecutive missed windows
    age: jax.Array      # i32[M] windows since spawn


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    max_tracks: int = 4
    gate_deg: float = 5.0      # association gate
    alpha: float = 0.5         # position gain
    beta: float = 0.15         # velocity gain
    max_missed: int = 5        # windows before a track dies
    min_age: int = 3           # windows before a track is "confirmed"


def init_tracks(tc: TrackerConfig) -> TrackState:
    M = tc.max_tracks
    return TrackState(
        angle=jnp.zeros(M, jnp.float32),
        vel=jnp.zeros(M, jnp.float32),
        active=jnp.zeros(M, bool),
        missed=jnp.zeros(M, jnp.int32),
        age=jnp.zeros(M, jnp.int32),
    )


def _step(tc: TrackerConfig, state: TrackState, det):
    """One window update. det: (angles f32[K], values f32[K])."""
    d_ang, d_val = det
    K = d_ang.shape[0]
    M = tc.max_tracks
    pred = state.angle + state.vel

    # Greedy association, tracks in slot order (static unroll, M is small).
    used = jnp.zeros(K, bool)
    match_idx = jnp.full(M, -1, jnp.int32)
    for m in range(M):
        cost = jnp.abs(pred[m] - d_ang)
        cost = jnp.where(used, jnp.inf, cost)
        j = jnp.argmin(cost)
        ok = state.active[m] & (cost[j] <= tc.gate_deg)
        match_idx = match_idx.at[m].set(jnp.where(ok, j, -1))
        used = used.at[j].set(used[j] | ok)

    matched = match_idx >= 0
    d_matched = d_ang[jnp.clip(match_idx, 0, K - 1)]
    resid = d_matched - pred
    new_angle = jnp.where(matched, pred + tc.alpha * resid, pred)
    new_vel = jnp.where(matched, state.vel + tc.beta * resid, state.vel)
    new_missed = jnp.where(matched, 0, state.missed + 1)
    still_active = state.active & (new_missed <= tc.max_missed)
    new_age = jnp.where(still_active, state.age + 1, 0)

    # Spawn: assign unmatched detections (by descending value) to free
    # slots (static double loop, M and K small).
    free = ~still_active
    angle_s, vel_s, active_s, missed_s, age_s = (
        new_angle, new_vel, still_active, new_missed, new_age)
    order = jnp.argsort(-d_val)
    for kk in range(K):
        j = order[kk]
        can_spawn = ~used[j]
        # first free slot
        slot_scores = jnp.where(free, jnp.arange(M), M)
        slot = jnp.argmin(slot_scores)
        have_slot = free[slot] & can_spawn
        angle_s = angle_s.at[slot].set(
            jnp.where(have_slot, d_ang[j], angle_s[slot]))
        vel_s = vel_s.at[slot].set(jnp.where(have_slot, 0.0, vel_s[slot]))
        active_s = active_s.at[slot].set(active_s[slot] | have_slot)
        missed_s = missed_s.at[slot].set(
            jnp.where(have_slot, 0, missed_s[slot]))
        age_s = age_s.at[slot].set(jnp.where(have_slot, 0, age_s[slot]))
        free = free.at[slot].set(free[slot] & ~have_slot)
        used = used.at[j].set(True)  # each detection spawns at most once

    new_state = TrackState(angle_s, vel_s, active_s, missed_s, age_s)
    confirmed = active_s & (age_s >= tc.min_age)
    out = jnp.where(confirmed, angle_s, jnp.nan)
    return new_state, out


def track_batch(peak_angles, peak_values, tc: TrackerConfig = TrackerConfig(),
                init: TrackState | None = None):
    """peak_angles/peak_values: f32[B, K] per-window detections →
    (final TrackState, track_angles f32[B, max_tracks] with NaN for
    unconfirmed slots). Jit-compiled lax.scan over windows."""
    if init is None:
        init = init_tracks(tc)

    def step(carry, det):
        return _step(tc, carry, det)

    final, out = jax.lax.scan(step, init,
                              (jnp.asarray(peak_angles),
                               jnp.asarray(peak_values)))
    return final, out


def track_batch_np(peak_angles, peak_values,
                   tc: TrackerConfig = TrackerConfig()):
    """Host-numpy convenience wrapper returning a numpy track matrix."""
    _, out = jax.jit(
        lambda a, v: track_batch(a, v, tc))(peak_angles, peak_values)
    return np.asarray(out)
