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


def test_channel_closure_observable_after_enlister_release():
    # With the subscription point dropped and every receiver gone, a send
    # must observe closure (return False) instead of blocking forever for
    # receivers that can no longer appear (broadcast_bp.rs:181-190).
    ch = NativeChannel()
    rid = ch.subscribe()
    ch.release_enlister()
    ch.unsubscribe(rid)
    assert ch.send("x") is False


def test_graph_source_failure_surfaces():
    def boom():
        yield Samples(48000.0, np.zeros(8, np.complex64))
        raise ValueError("driver died")

    g = NativeGraph()
    src = g.source(boom())
    g.sink(g.block(GainControl(1.0), src))
    with pytest.raises(RuntimeError) as ei:
        g.run(timeout=30.0)
    assert isinstance(ei.value.__cause__, ValueError)


def test_graph_block_failure_surfaces_not_hangs():
    # A block whose bind() raises must fail the whole graph loudly and
    # promptly: its out-channel closes (sink drains out) and its
    # unsubscribe lets the upstream source observe closure, so run()
    # raises the real error instead of a masking TimeoutError.
    class _BadSpec:
        def bind(self, sig):
            raise ValueError("bad bind")

    data = np.arange(64, dtype=np.complex64)
    msgs = [Samples(48000.0, data[i:i + 8]) for i in range(0, 64, 8)]
    g = NativeGraph()
    src = g.source(msgs)
    g.sink(g.block(_BadSpec(), src, name="bad"))
    with pytest.raises(RuntimeError) as ei:
        g.run(timeout=30.0)
    assert isinstance(ei.value.__cause__, ValueError)


def test_graph_emits_warmup_on_rebind():
    # A mid-stream (chunk_len, rate) change silently re-initializes DSP
    # history; the native graph must announce it with a Warmup event like
    # the compiled actor path does (runtime/blocks.py::_send_warmup).
    from radiorust_tpu.blocks.filters import Filter
    from radiorust_tpu.signal import Warmup

    rng = np.random.default_rng(7)
    iq = (rng.standard_normal(1536) + 1j * rng.standard_normal(1536)
          ).astype(np.complex64)
    msgs = [Samples(48000.0, iq[:512]), Samples(48000.0, iq[512:1024]),
            Samples(48000.0, iq[1024:1280]),   # rebind: 512 -> 256
            Samples(48000.0, iq[1280:1536])]
    g = NativeGraph()
    src = g.source(msgs)
    lp = Filter(lambda bins, freqs: np.where(np.abs(freqs) <= 8000.0,
                                             1.0 + 0.0j, 0.0j))
    filt = g.block(lp, src)
    out = g.sink(filt)
    g.run(timeout=120.0)
    warmups = [e for e in out.events if isinstance(e, Warmup)]
    assert len(warmups) == 2          # initial bind + mid-stream rebind
    assert all(w.steps == 1 for w in warmups)
    assert len(out.chunks) == 4


def test_graph_broadcast_fanout_two_branches():
    # One producer feeding two lock-step consumer branches through the
    # C++ channel (the reference's broadcast topology, flow.rs:44-52):
    # both branches see every chunk; the slower branch backpressures the
    # faster one, never drops.
    data = np.arange(256, dtype=np.complex64)
    msgs = [Samples(48000.0, data[i:i + 32]) for i in range(0, 256, 32)]
    g = NativeGraph()
    src = g.source(msgs)
    out_a = g.sink(g.block(GainControl(0.5), src, name="a"))
    out_b = g.sink(g.block(GainControl(2.0), src, name="b"))
    g.run(timeout=60.0)
    np.testing.assert_allclose(out_a.samples, data * 0.5, atol=1e-6)
    np.testing.assert_allclose(out_b.samples, data * 2.0, atol=1e-6)


def test_graph_threaded_stress():
    # Race-surface soak: a 3-stage pipeline with a fan-out tap, many small
    # chunks, checked for exact delivery (count and values) — exercises
    # the C++ channel's subscribe/seq bookkeeping under real thread
    # interleaving.
    n_chunks, n = 200, 16
    rng = np.random.default_rng(11)
    data = (rng.standard_normal(n_chunks * n)
            + 1j * rng.standard_normal(n_chunks * n)).astype(np.complex64)
    msgs = [Samples(8000.0, data[i * n:(i + 1) * n])
            for i in range(n_chunks)]
    g = NativeGraph()
    src = g.source(msgs)
    s1 = g.block(GainControl(2.0), src, name="g1")
    tap = g.sink(s1, name="tap")
    s2 = g.block(GainControl(0.25), s1, name="g2")
    out = g.sink(s2, name="out")
    g.run(timeout=120.0)
    assert len(tap.chunks) == n_chunks and len(out.chunks) == n_chunks
    np.testing.assert_allclose(tap.samples, data * 2.0, atol=1e-5)
    np.testing.assert_allclose(out.samples, data * 0.5, atol=1e-5)
