"""Native (C++ channel + threads) runtime tests."""

import threading

import numpy as np
import pytest

from radiorust_tpu.blocks.transform import FreqShifter, GainControl
from radiorust_tpu.runtime.native import NativeChannel, NativeGraph
from radiorust_tpu.signal import Samples


def test_channel_basic_handoff():
    ch = NativeChannel()
    got = []

    def consumer():
        rid = ch.subscribe()
        while True:
            ok, obj = ch.recv(rid, timeout_ms=5000)
            if not ok:
                return
            got.append(obj)

    t = threading.Thread(target=consumer, daemon=True)
    t.start()
    for v in ["a", "b", "c"]:
        assert ch.send(v)
    ch.close_sender()
    t.join(5)
    assert got == ["a", "b", "c"]


def test_channel_broadcast_backpressure():
    ch = NativeChannel()
    results = [[], []]
    ready = threading.Barrier(3)

    def consumer(i):
        rid = ch.subscribe()
        ready.wait()
        while True:
            ok, obj = ch.recv(rid, timeout_ms=5000)
            if not ok:
                return
            results[i].append(obj)

    threads = [threading.Thread(target=consumer, args=(i,), daemon=True)
               for i in range(2)]
    for t in threads:
        t.start()
    ready.wait()
    for v in range(5):
        assert ch.send(v)
    ch.close_sender()
    for t in threads:
        t.join(5)
    assert results[0] == list(range(5))
    assert results[1] == list(range(5))


def test_native_graph_pipeline():
    data = np.arange(32, dtype=np.complex64)
    msgs = [Samples(48000.0, data[i:i + 8]) for i in range(0, 32, 8)]
    g = NativeGraph()
    src = g.source(msgs)
    gain = g.block(GainControl(0.5), src)
    shift = g.block(FreqShifter.with_shift(0.0), gain)
    out = g.sink(shift)
    g.run(timeout=60.0)
    np.testing.assert_allclose(out.samples, data * 0.5, atol=1e-6)
    assert out.sample_rate == 48000.0
    # Per-block counters (tracing subsystem) record in the native graph too.
    assert gain.stats.chunks == 4 and gain.stats.samples == 32
    assert gain.stats.wall_seconds > 0.0
