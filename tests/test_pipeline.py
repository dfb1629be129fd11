"""Pipeline parallelism: stage-per-device execution must be numerically
identical to sequential scanning — including chains that time sharding
cannot handle (sequential per-sample state) and chains whose batch grows
mid-stream (channelizer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radiorust_tpu.blocks.base import Chain, StreamSig, scan
from radiorust_tpu.blocks.filters import Filter, SlewRateLimiter
from radiorust_tpu.blocks.modulation import FmDemod
from radiorust_tpu.blocks.transform import FreqShifter, GainControl
from radiorust_tpu.models.wfm import wfm_receiver
from radiorust_tpu.parallel.pipeline import PipelinedChain, balance_partition


def lowpass(cut):
    def resp(bins, freqs):
        return np.where(np.abs(freqs) <= cut, 1.0 + 0.0j, 0.0j)
    return resp


def make_iq(t, batch, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((t, batch, n))
            + 1j * rng.standard_normal((t, batch, n))).astype(np.complex64)


def sequential(chain, sig, xs, resets=None):
    bound = chain.bind(sig)
    if resets is None:
        resets = np.zeros(xs.shape[:2], dtype=bool)
    _, ys = scan(bound, bound.params, bound.init_state(), jnp.asarray(xs),
                 jnp.asarray(resets))
    return np.asarray(ys)


def test_balance_partition():
    assert balance_partition(7, 3) == [3, 2, 2]
    assert balance_partition(4, 4) == [1, 1, 1, 1]
    assert balance_partition(5, 1) == [5]
    with pytest.raises(ValueError):
        balance_partition(2, 3)
    with pytest.raises(ValueError):
        balance_partition(2, 0)


def test_pipeline_matches_sequential_wfm():
    """Full WFM chain, one block per device (7 stages), random IQ."""
    sig = StreamSig(2, 2048, 1024000.0)
    chain = wfm_receiver()
    xs = make_iq(6, 2, 2048, seed=1)
    want = sequential(chain, sig, xs)
    pl = PipelinedChain(chain.bind(sig))
    assert pl.depth == len(chain.bind(sig).blocks)
    got = pl.run(xs)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pipeline_slew_chain():
    """The morse-style chain contains SlewRateLimiter, whose per-sample
    recurrence cannot time-shard (src/blocks/filters.rs:338-349) — the
    pipeline is its only multi-device axis, and must be exact."""
    sig = StreamSig(2, 64, 8000.0)
    chain = Chain(SlewRateLimiter(16000.0), Filter.new(lowpass(2000.0)),
                  GainControl(0.5), FreqShifter.with_shift(700.0))
    xs = make_iq(5, 2, 64, seed=2)
    want = sequential(chain, sig, xs)
    pl = PipelinedChain(chain.bind(sig))
    got = pl.run(xs)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pipeline_explicit_partition():
    """Fewer devices than blocks: contiguous grouping, same numbers."""
    sig = StreamSig(2, 64, 8000.0)
    chain = Chain(FreqShifter.with_shift(500.0), Filter.new(lowpass(2000.0)),
                  FmDemod(1000.0), GainControl(2.0))
    xs = make_iq(5, 2, 64, seed=3)
    want = sequential(chain, sig, xs)
    devs = jax.devices()[:2]
    pl = PipelinedChain(chain.bind(sig), devices=devs, partition=[3, 1])
    assert pl.depth == 2
    got = pl.run(xs)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # Stage programs really live on distinct devices.
    assert pl.stages[0].device != pl.stages[1].device


def test_pipeline_reset_propagates():
    """A mid-stream interrupt mask must hit each stage when *that chunk*
    reaches it — matching the reference's in-band interrupt events riding
    the data path (src/signal.rs:179-183)."""
    sig = StreamSig(2, 64, 8000.0)
    chain = Chain(Filter.new(lowpass(2000.0)), FmDemod(1000.0))
    xs = make_iq(6, 2, 64, seed=4)
    resets = np.zeros((6, 2), dtype=bool)
    resets[3, 0] = True  # stream 0 interrupted at chunk 3
    want = sequential(chain, sig, xs, resets)
    pl = PipelinedChain(chain.bind(sig), devices=jax.devices()[:2])
    got = pl.run(xs, resets)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pipeline_channelizer_batch_growth():
    """Batch-growing stage (64-channel PFB folds channels into batch):
    the reset mask expands across the stage boundary."""
    from radiorust_tpu.blocks.channelize import Channelizer
    sig = StreamSig(1, 1024, 1024000.0)
    chain = Chain(Channelizer(64), GainControl(0.5))
    xs = make_iq(4, 1, 1024, seed=5)
    want = sequential(chain, sig, xs)
    pl = PipelinedChain(chain.bind(sig), devices=jax.devices()[:2])
    got = pl.run(xs)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pipeline_incremental_push_and_reset():
    """push/drain API: outputs appear after `depth` pushes; reset()
    restarts the stream identically."""
    sig = StreamSig(2, 64, 8000.0)
    chain = Chain(Filter.new(lowpass(2000.0)), GainControl(0.5))
    xs = make_iq(3, 2, 64, seed=6)
    want = sequential(chain, sig, xs)
    pl = PipelinedChain(chain.bind(sig), devices=jax.devices()[:2])
    from radiorust_tpu.blocks.base import unpack_wire

    def stream_all():
        outs = []
        for t in range(3):
            y = pl.push(xs[t])
            if y is not None:
                outs.append(unpack_wire(jax.device_get(y)))
        while len(outs) < 3:
            y = pl.push(None)
            if y is not None:
                outs.append(unpack_wire(jax.device_get(y)))
        return np.stack(outs)

    got1 = stream_all()
    np.testing.assert_allclose(got1, want, atol=2e-4)
    pl.reset()
    got2 = stream_all()
    np.testing.assert_allclose(got2, got1, atol=0)
