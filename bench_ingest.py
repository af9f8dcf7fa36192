"""Ingest-path benchmarks: native framer + loopback UDP source.

Prints one JSON line per row:
  * native framer split/interleave throughput (the ≥1.28 GB/s
    host-framing requirement — 16 ch × 10 Msps × 8 B)
  * loopback UDP receive rate + loss through UdpSource (the UHD
    stand-in; Python receive loop — the framer number bounds what a
    native receiver would sustain)

Run: python bench_ingest.py
"""

import json
import sys
import time

import numpy as np


def log(m):
    print(f"[ingest] {m}", file=sys.stderr, flush=True)


def bench_framer():
    from doa_tpu.io.native import split_c64
    x = (np.random.default_rng(0).standard_normal((1 << 22, 16)).astype(
        np.float32) + 0j).astype(np.complex64)
    split_c64(x)  # warm / build
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        split_c64(x)
    dt = (time.perf_counter() - t0) / iters
    gbps = x.nbytes / dt / 1e9
    print(json.dumps({"metric": "native_framer_GBps",
                      "value": round(gbps, 2),
                      "vs_required_1p28": round(gbps / 1.28, 2)}),
          flush=True)


def bench_udp():
    from doa_tpu.io.socket_source import loopback_rate_bench
    gbps, loss = loopback_rate_bench(seconds=1.0)
    print(json.dumps({"metric": "udp_loopback_ingest_GBps",
                      "value": round(gbps, 2),
                      "loss_fraction": round(loss, 3),
                      "vs_required_1p28": round(gbps / 1.28, 2)}),
          flush=True)


if __name__ == "__main__":
    bench_framer()
    bench_udp()
