"""UDP ingest (reference P1 twinrx_usrp_source stand-in): loopback
end-to-end into the streaming pipeline + rate/loss accounting."""

import time

import numpy as np

import golden
from doa_tpu import PRESETS
from doa_tpu.io.socket_source import UdpSource, send_capture_udp
from doa_tpu.io.stream import StreamingDriver
from doa_tpu.pipeline_tpu import build_pipeline_tpu


def test_udp_to_pipeline_end_to_end():
    cfg = PRESETS["c1_ula4_tone"]
    pipe = build_pipeline_tpu(cfg)
    drv = StreamingDriver(pipe, block_samples=8 * 256).start()
    src = UdpSource(drv, num_channels=4, block_samples=8 * 256).start()

    x = golden.synthetic_ula_iq([64.0], 4, 0.5, 64 * 256, snr_db=15,
                                seed=5)
    send_capture_udp(x.astype(np.complex64), src.addr,
                     datagram_frames=500)
    deadline = time.time() + 20
    results = []
    while len(results) < 4 and time.time() < deadline:
        try:
            results.append(drv.results.get(timeout=0.5))
        except Exception:
            pass
    src.stop()
    drv.stop()
    assert len(results) >= 4, f"stats: {src.stats} {drv.stats}"
    assert src.stats.packets_lost == 0
    angles = np.concatenate(
        [np.asarray(r.peak_angles["music"]).ravel()
         for _, r in results])
    np.testing.assert_allclose(angles, 64.0, atol=1.0)


def test_udp_sequence_gap_detection():
    class _Sink:
        def push(self, b):
            return True

    src = UdpSource(_Sink(), num_channels=4, block_samples=1024).start()
    x = np.zeros((500, 4), np.complex64)
    seq = send_capture_udp(x, src.addr, datagram_frames=100, seq0=0)
    # skip two sequence numbers → 2 lost packets
    send_capture_udp(x, src.addr, datagram_frames=100, seq0=seq + 2)
    time.sleep(0.3)
    src.stop()
    assert src.stats.packets_lost == 2
    assert src.stats.packets_in == 10


def test_native_sender_wire_format():
    """The C++ sendmmsg transmitter (doa_udp_send) must produce exactly
    the Python sender's wire format: same sequence numbering, same
    payload bytes, zero loss at test rates. (Rate thresholds live in
    bench_ingest.py, NOT here — wall-clock perf assertions are flaky on
    a shared 2-core container.)"""
    from doa_tpu.io.native import get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")

    class _Capture:
        def __init__(self):
            self.blocks = []

        def push(self, b):
            self.blocks.append(b)
            return True

    sink = _Capture()
    src = UdpSource(sink, num_channels=4, block_samples=512).start()
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((2048, 4))
         + 1j * rng.standard_normal((2048, 4))).astype(np.complex64)
    nxt = send_capture_udp(x, src.addr, datagram_frames=100, native=True)
    assert nxt == -(-2048 // 100)  # 21 datagrams, seq numbering matches
    deadline = time.time() + 10
    while len(sink.blocks) < 4 and time.time() < deadline:
        time.sleep(0.05)
    src.stop()
    assert src.stats.packets_lost == 0, f"stats: {src.stats}"
    got = np.concatenate(sink.blocks, axis=0)
    np.testing.assert_array_equal(got, x[:got.shape[0]])
    assert got.shape[0] == 2048


def test_native_udp_source_end_to_end():
    """C++ drain loop (native/framer.cpp::doa_udp_drain): same wire
    format, same block assembly, GIL-free receive."""
    from doa_tpu.io.native import get_lib
    from doa_tpu.io.socket_source import NativeUdpSource
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    cfg = PRESETS["c1_ula4_tone"]
    pipe = build_pipeline_tpu(cfg)
    drv = StreamingDriver(pipe, block_samples=8 * 256).start()
    src = NativeUdpSource(drv, num_channels=4,
                          block_samples=8 * 256).start()
    x = golden.synthetic_ula_iq([64.0], 4, 0.5, 32 * 256, snr_db=15,
                                seed=5)
    send_capture_udp(x.astype(np.complex64), src.addr,
                     datagram_frames=512)
    deadline = time.time() + 20
    results = []
    while len(results) < 2 and time.time() < deadline:
        try:
            results.append(drv.results.get(timeout=0.5))
        except Exception:
            pass
    src.stop()
    drv.stop()
    assert len(results) >= 2, f"stats: {src.stats} {drv.stats}"
    assert src.stats.packets_lost == 0
    angles = np.concatenate(
        [np.asarray(r.peak_angles["music"]).ravel() for _, r in results])
    np.testing.assert_allclose(angles, 64.0, atol=1.0)
