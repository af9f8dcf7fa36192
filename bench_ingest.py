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
    for native in (False, True):
        gbps, loss, _ = loopback_rate_bench(seconds=1.0, native=native)
        print(json.dumps({
            "metric": ("udp_loopback_ingest_native_GBps" if native
                       else "udp_loopback_ingest_python_GBps"),
            "value": round(gbps, 2),
            "loss_fraction": round(loss, 3),
            "note": "sender shares the container's 2 cores",
            "vs_required_1p28": round(gbps / 1.28, 2)}), flush=True)


def bench_udp_e2e():
    """The composed ingest chain with BOTH ends native (sendmmsg
    transmitter + GIL-free drain + block assembly): socket → ring →
    framed (block_samples, N) c64 blocks delivered to the sink. This is
    the in-CI proof that the chain sustains the ≥1.28 GB/s north-star
    on 2 cores (the earlier pure-Python sender was the bottleneck:
    0.27 GB/s with 90% loss)."""
    from doa_tpu.io.native import get_lib
    from doa_tpu.io.socket_source import loopback_rate_bench
    if get_lib() is None:                      # pragma: no cover
        log("native library unavailable; skipping e2e row")
        return
    # Paced offered rates: a radio offers samples at line rate, so the
    # sustainable number is the highest paced rate with ~zero loss (an
    # unpaced sendmmsg blast measures 24 GB/s into a 16 MB socket
    # buffer — kernel drop behavior, not the chain).
    best = (0.0, 1.0, 0.0, 0.0)
    for target in (1.4, 2.0, 2.8):
        r = loopback_rate_bench(seconds=1.0, native=True,
                                native_sender=True, target_gbps=target)
        log(f"paced {target} GB/s → delivered {r[2]:.2f}, "
            f"loss {r[1]:.1%}")
        if r[1] < 0.01 and r[2] > best[2]:
            best = (*r, target)
    gbps, loss, delivered, target = best
    print(json.dumps({
        "metric": "udp_e2e_native_blocks_delivered_GBps",
        "value": round(delivered, 2),
        "offered_GBps": target,
        "received_GBps": round(gbps, 2),
        "loss_fraction": round(loss, 3),
        "note": ("native sendmmsg tx (paced) + native drain rx, "
                 "framed blocks, loss < 1%"),
        "vs_required_1p28": round(delivered / 1.28, 2)}), flush=True)
    if delivered < 1.28:                        # pragma: no cover
        log(f"WARNING: e2e delivered {delivered:.2f} GB/s < 1.28 target")


def bench_native_drain():
    """Pure receive rate of the C++ drain (sender pre-fills the kernel
    buffer, so the 2-core sender bottleneck is excluded)."""
    import ctypes
    import socket

    from doa_tpu.io.native import get_lib
    from doa_tpu.io.socket_source import send_capture_udp
    lib = get_lib()
    if lib is None:                            # pragma: no cover
        return
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 26)
    s.bind(("127.0.0.1", 0))
    x = np.ones((1 << 15, 16), np.complex64)
    buf = np.empty(1 << 26, np.uint8)
    stats = np.zeros(4, np.int64)
    stats[3] = -1
    rates = []
    for trial in range(5):
        send_capture_udp(x, s.getsockname(), seq0=trial * 1000)
        time.sleep(0.05)
        t0 = time.perf_counter()
        w = lib.doa_udp_drain(
            s.fileno(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size, buf.size, 0,
            stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        rates.append(w / (time.perf_counter() - t0) / 1e9)
    s.close()
    gbps = float(np.median(rates))
    print(json.dumps({"metric": "udp_native_drain_GBps",
                      "value": round(gbps, 2),
                      "vs_required_1p28": round(gbps / 1.28, 2)}),
          flush=True)


if __name__ == "__main__":
    bench_framer()
    bench_udp()
    bench_native_drain()
    bench_udp_e2e()
