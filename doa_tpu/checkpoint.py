"""Streaming-state checkpoint/resume (SURVEY §5).

The reference's only persisted state is its calibration files (handled by
doa_tpu.calib.artifacts). For the streaming/tracking deployment
(BASELINE config 4) this module additionally snapshots the live pipeline
state — the covariance ring carry, the overlap tail, and tracker state —
so a long-running estimator can restart without re-priming windows or
losing tracks.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import numpy as np

from doa_tpu.tracking import TrackState

CHECKPOINT_VERSION = 1


@dataclasses.dataclass
class StreamState:
    """Everything needed to resume a streaming DoA session."""

    cov_carry_re: Optional[np.ndarray] = None   # (S/hop, N, N)
    cov_carry_im: Optional[np.ndarray] = None
    overlap_tail: Optional[np.ndarray] = None   # (overlap, N) complex64
    track_state: Optional[TrackState] = None
    samples_processed: int = 0
    created_unix: float = 0.0
    version: int = CHECKPOINT_VERSION


def _norm_path(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths; normalize the same
    way on save AND load so round-trips work with any path spelling."""
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def save_stream_state(path: str, st: StreamState):
    path = _norm_path(path)
    arrays = {"meta": json.dumps({
        "version": st.version,
        "samples_processed": int(st.samples_processed),
        "created_unix": st.created_unix or time.time(),
    })}
    if st.cov_carry_re is not None:
        arrays["cov_carry_re"] = np.asarray(st.cov_carry_re, np.float32)
        arrays["cov_carry_im"] = np.asarray(st.cov_carry_im, np.float32)
    if st.overlap_tail is not None:
        arrays["overlap_tail"] = np.asarray(st.overlap_tail, np.complex64)
    if st.track_state is not None:
        ts = st.track_state
        arrays["track_angle"] = np.asarray(ts.angle, np.float32)
        arrays["track_vel"] = np.asarray(ts.vel, np.float32)
        arrays["track_active"] = np.asarray(ts.active, bool)
        arrays["track_missed"] = np.asarray(ts.missed, np.int32)
        arrays["track_age"] = np.asarray(ts.age, np.int32)
    np.savez(path, **arrays)


def load_stream_state(path: str) -> StreamState:
    with np.load(_norm_path(path)) as z:
        meta = json.loads(str(z["meta"]))
        if meta["version"] > CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint version {meta['version']} newer than "
                f"supported {CHECKPOINT_VERSION}")
        ts = None
        if "track_angle" in z:
            import jax.numpy as jnp

            ts = TrackState(
                angle=jnp.asarray(z["track_angle"]),
                vel=jnp.asarray(z["track_vel"]),
                active=jnp.asarray(z["track_active"]),
                missed=jnp.asarray(z["track_missed"]),
                age=jnp.asarray(z["track_age"]),
            )
        return StreamState(
            cov_carry_re=(z["cov_carry_re"] if "cov_carry_re" in z
                          else None),
            cov_carry_im=(z["cov_carry_im"] if "cov_carry_im" in z
                          else None),
            overlap_tail=(z["overlap_tail"] if "overlap_tail" in z
                          else None),
            track_state=ts,
            samples_processed=int(meta["samples_processed"]),
            created_unix=float(meta.get("created_unix", 0.0)),
            version=int(meta["version"]),
        )
