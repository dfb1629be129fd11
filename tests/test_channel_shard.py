"""Channel (expert) parallelism: the M channels of a channelizer chain —
PFB branch groups, DFT channel columns, and all downstream per-channel
processing — split over a mesh axis, numerically identical to the
single-device chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from radiorust_tpu.blocks.base import Chain, StreamSig, scan
from radiorust_tpu.blocks.channelize import Channelizer
from radiorust_tpu.blocks.modulation import FmDemod
from radiorust_tpu.blocks.transform import FreqShifter, GainControl
from radiorust_tpu.models.channelizer import channelized_receiver
from radiorust_tpu.parallel.channel_shard import ChannelShardedChain


def make_iq(t, batch, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((t, batch, n))
            + 1j * rng.standard_normal((t, batch, n))).astype(np.complex64)


def drive(cs, xs, resets=None):
    state = cs.init_state()
    outs = []
    for s in range(xs.shape[0]):
        r = None if resets is None else resets[s]
        state, y = cs.process(cs.params, state, jnp.asarray(xs[s]), r)
        outs.append(np.asarray(y))
    return np.stack(outs)


@pytest.mark.parametrize("ndev", [8, 4])
def test_channel_sharded_receiver_matches_sequential(ndev):
    """channelized_receiver (PFB -> per-channel FM demod -> gain) on a
    channel mesh: multi-step outputs and state carry match the
    single-device scan."""
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("c",))
    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(2, 1024, 1024000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c")

    xs = make_iq(3, 2, 1024, seed=1)
    got = drive(cs, xs)
    _, want = scan(bound, bound.params, bound.init_state(), jnp.asarray(xs))
    want = np.asarray(want)
    assert got.shape == want.shape == (3, 2 * 64, 16)
    # Demod on near-empty channels is atan2 noise; compare only rows with
    # signal energy (same guard as test_channelizer's oracle).
    power = np.abs(want).mean(axis=(0, 2))
    rows = power > 1e-3
    np.testing.assert_allclose(got[:, rows], want[:, rows], atol=5e-4)


def test_channel_sharded_reset_mask():
    """Per-stream interrupt resets propagate to the sharded channel rows
    exactly as in the single-device chain."""
    mesh = Mesh(np.array(jax.devices()), ("c",))
    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(2, 1024, 1024000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c")

    xs = make_iq(3, 2, 1024, seed=2)
    resets = np.zeros((3, 2), bool)
    resets[1, 0] = True                     # stream 0 breaks at step 1
    got = drive(cs, xs, resets)
    _, want = scan(bound, bound.params, bound.init_state(),
                   jnp.asarray(xs), resets=resets)
    want = np.asarray(want)
    power = np.abs(want).mean(axis=(0, 2))
    rows = power > 1e-3
    np.testing.assert_allclose(got[:, rows], want[:, rows], atol=5e-4)


def test_channel_sharded_with_downstream_filter_state():
    """A stateful per-channel block downstream (FreqShifter's phase index)
    keeps its sharded state aligned with its channel rows across steps."""
    mesh = Mesh(np.array(jax.devices()), ("c",))
    chain = Chain(Channelizer(16, taps_per_branch=4),
                  FreqShifter.with_shift(100.0),
                  GainControl(0.5))
    sig = StreamSig(1, 256, 16000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c")

    xs = make_iq(4, 1, 256, seed=3)
    got = drive(cs, xs)
    _, want = scan(bound, bound.params, bound.init_state(), jnp.asarray(xs))
    np.testing.assert_allclose(got, np.asarray(want), atol=5e-4)


def test_channel_sharded_validation():
    mesh = Mesh(np.array(jax.devices()), ("c",))
    sig = StreamSig(1, 256, 16000.0)
    # Not a channelizer-led chain.
    plain = Chain(GainControl(1.0), FmDemod(1000.0)).bind(sig)
    with pytest.raises(ValueError, match="first block is a Channelizer"):
        ChannelShardedChain(plain, mesh, axis="c")
    # M not divisible by the axis size.
    small = Chain(Channelizer(4, taps_per_branch=2)).bind(
        StreamSig(1, 64, 8000.0))
    with pytest.raises(ValueError, match="not divisible"):
        ChannelShardedChain(small, mesh, axis="c")


def test_channel_sharded_2d_streams_by_channels():
    """2-D mesh: stream batch shards over 's' (data-parallel serving)
    while channels shard over 'c'; matches the single-device scan."""
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("s", "c"))
    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(4, 1024, 1024000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c", stream_axis="s")

    xs = make_iq(3, 4, 1024, seed=4)
    resets = np.zeros((3, 4), bool)
    resets[2, 1] = True
    got = drive(cs, xs, resets)
    _, want = scan(bound, bound.params, bound.init_state(),
                   jnp.asarray(xs), resets=resets)
    want = np.asarray(want)
    power = np.abs(want).mean(axis=(0, 2))
    rows = power > 1e-3
    np.testing.assert_allclose(got[:, rows], want[:, rows], atol=5e-4)

    with pytest.raises(ValueError, match="stream batch"):
        ChannelShardedChain(chain.bind(StreamSig(3, 1024, 1024000.0)),
                            mesh, axis="c", stream_axis="s")


def _random_downstream(rng, ch_rate, ch_n):
    """Random batch-preserving per-channel composition (the channel-shard
    analog of test_parallel._random_chain)."""
    from radiorust_tpu.blocks.filters import Filter
    from radiorust_tpu.blocks.modulation import FmMod
    from radiorust_tpu.blocks.resampling import Downsampler

    def lowpass(cut):
        def resp(bins, freqs):
            return np.where(np.abs(freqs) <= cut, 1.0 + 0.0j, 0.0j)
        return resp

    specs = []
    n_down = 0
    rate, n = ch_rate, ch_n
    for _ in range(int(rng.integers(2, 5))):
        kind = rng.choice(["shift", "filter", "gain", "demod", "mod",
                           "down"])
        if kind == "shift":
            specs.append(FreqShifter.with_shift(float(rate) / 16.0))
        elif kind == "filter":
            specs.append(Filter.new(lowpass(rate / 4.0)))
        elif kind == "gain":
            specs.append(GainControl(1.5))
        elif kind == "demod":
            specs.append(FmDemod(rate / 8.0))
        elif kind == "mod":
            specs.append(FmMod(rate / 8.0))
        elif kind == "down":
            if n_down >= 1 or n < 32:
                specs.append(GainControl(0.5))
            else:
                specs.append(Downsampler(rate / 2.0, rate / 4.0))
                rate, n = rate / 2.0, n // 2
                n_down += 1
    return specs


@pytest.mark.parametrize("seed", range(4))
def test_channel_sharded_random_downstream(seed):
    """Random per-channel compositions downstream of the PFB (stateful
    filters, resamplers, mod/demod) stay numerically identical to the
    single-device chain under channel sharding."""
    rng = np.random.default_rng(seed)
    m, n, rate = 16, 1024, 16000.0
    specs = [Channelizer(m, taps_per_branch=4)]
    specs += _random_downstream(rng, rate / m, n // m)
    chain = Chain(*specs)
    sig = StreamSig(1, n, rate)
    bound = chain.bind(sig)
    mesh = Mesh(np.array(jax.devices()), ("c",))
    cs = ChannelShardedChain(bound, mesh, axis="c")

    xs = make_iq(3, 1, n, seed=seed + 30)
    got = drive(cs, xs)
    _, want = scan(bound, bound.params, bound.init_state(), jnp.asarray(xs))
    np.testing.assert_allclose(got, np.asarray(want), atol=5e-4)


def _drive_actor(make_block, chunks, rate, n_out, setter=None, at=None):
    """Drive a runtime actor with 1-D chunks; optionally call setter(block)
    after chunk index `at`."""
    import asyncio

    from radiorust_tpu.runtime import ArraySink
    from radiorust_tpu.runtime.flow import new_sender
    from radiorust_tpu.signal import Samples

    async def main():
        sender, connector = new_sender()
        blk = make_block()
        sink = ArraySink()
        blk.feed_from(type("P", (), {"sender_connector": connector})())
        sink.feed_from(blk)
        for i, c in enumerate(chunks):
            await sender.send(Samples(rate, c))
            if setter is not None and i == at:
                while len(sink.chunks) < i + 1:   # let it drain first
                    await asyncio.sleep(0.01)
                setter(blk)
        for _ in range(2000):
            if len(sink.chunks) >= n_out:
                break
            await asyncio.sleep(0.01)
        assert blk.failure is None, blk.failure
        return sink.chunks

    return asyncio.run(main())


def test_runtime_batch_growing_chain_keeps_channels():
    """A 1-D stream through a batch-growing chain (Channelizer) must emit
    2-D [channels, t] chunks — y[0] would silently strip all but channel
    0 (regression test for the _fetch_send flatten rule)."""
    from radiorust_tpu.runtime import RuntimeBlock

    chain = Chain(Channelizer(4, taps_per_branch=2), GainControl(1.0))
    xs = make_iq(2, 1, 64, seed=7)[:, 0]            # 1-D chunks [64]
    got = _drive_actor(lambda: RuntimeBlock(chain), list(xs), 8000.0, 2)
    assert got[0].shape == (4, 16)
    bound = chain.bind(StreamSig(1, 64, 8000.0))
    _, want = scan(bound, bound.params, bound.init_state(),
                   jnp.asarray(xs[:, None, :]))
    np.testing.assert_allclose(np.stack(got), np.asarray(want), atol=1e-5)


def test_runtime_block_channel_sharded_actor():
    """RuntimeBlock(shard='channels'): one wideband 1-D stream served by
    the whole mesh; folded-channel outputs, live set_shift retune (phase-
    continuous on the sharded state), and non-channelizer fallback all
    match the unsharded actor."""
    from radiorust_tpu.blocks.modulation import FmDemod
    from radiorust_tpu.runtime import RuntimeBlock

    mesh = Mesh(np.array(jax.devices()), ("c",))
    chain = Chain(Channelizer(16, taps_per_branch=4),
                  FreqShifter.with_shift(50.0), GainControl(0.5))
    xs = make_iq(4, 1, 512, seed=8)[:, 0]           # 1-D chunks [512]

    def retune(blk):
        blk.set_shift(75.0)

    got = _drive_actor(
        lambda: RuntimeBlock(chain, mesh=mesh, shard="channels"),
        list(xs), 16000.0, 4, setter=retune, at=1)
    want = _drive_actor(
        lambda: RuntimeBlock(chain),
        list(xs), 16000.0, 4, setter=retune, at=1)
    assert len(got) == len(want) == 4
    assert got[0].shape == (16, 32)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=5e-4)

    # Non-channelizer spec: warns and falls back to the single-device
    # program instead of failing the actor.
    plain = Chain(GainControl(2.0))
    got_p = _drive_actor(
        lambda: RuntimeBlock(plain, mesh=mesh, shard="channels"),
        list(xs), 16000.0, 4)
    np.testing.assert_allclose(np.stack(got_p), 2.0 * xs, atol=1e-6)

    with pytest.raises(ValueError, match="requires a mesh"):
        RuntimeBlock(chain, shard="channels")
    with pytest.raises(ValueError, match="streams.*channels"):
        RuntimeBlock(chain, mesh=mesh, shard="rows")


def test_channel_sharded_actor_checkpoint_resume(tmp_path):
    """A channel-sharded actor's stream state (sharded per-channel leaves
    included) checkpoints and resumes bit-exactly: the resumed actor's
    outputs equal an uninterrupted run."""
    from radiorust_tpu.runtime import RuntimeBlock

    mesh = Mesh(np.array(jax.devices()), ("c",))
    chain = channelized_receiver(num_channels=16, input_rate=16000.0)
    xs = make_iq(4, 1, 512, seed=11)[:, 0]          # 1-D chunks [512]
    path = str(tmp_path / "cs.ckpt.npz")

    def make():
        return RuntimeBlock(chain, mesh=mesh, shard="channels")

    # Uninterrupted reference run.
    want = _drive_actor(make, list(xs), 16000.0, 4)

    # Run 2 chunks, checkpoint, resume in a fresh actor for chunks 3-4.
    def save(blk):
        blk.save_checkpoint(path)

    first = _drive_actor(make, list(xs[:2]), 16000.0, 2, setter=save, at=1)

    def make_resumed():
        blk = make()
        blk.load_checkpoint(path)
        return blk

    rest = _drive_actor(make_resumed, list(xs[2:]), 16000.0, 2)
    got = first + rest
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=0.0)   # bit-exact resume
