"""Checkpoint/resume: a restored pipeline continues bit-identically."""

import numpy as np

import jax.numpy as jnp

from radiorust_tpu.blocks.base import StreamSig, scan
from radiorust_tpu.models.wfm import wfm_receiver
from radiorust_tpu.utils.checkpoint import load_state, save_state


def test_save_load_roundtrip_types(tmp_path):
    tree = {
        "a": np.arange(6, dtype=np.int32),
        "b": (np.ones(3, np.complex64) * (1 + 2j),
              {"c": np.float32(2.5)}),
        "d": [np.zeros((2, 2), np.float32)],
    }
    path = tmp_path / "ckpt.npz"
    save_state(str(path), tree)
    got = load_state(str(path))
    np.testing.assert_array_equal(got["a"], tree["a"])
    np.testing.assert_array_equal(got["b"][0], tree["b"][0])
    assert got["b"][0].dtype == np.complex64
    np.testing.assert_allclose(got["b"][1]["c"], 2.5)
    assert isinstance(got["b"], tuple)
    assert isinstance(got["d"], list)


def test_resume_continues_stream(tmp_path):
    n = 2048
    sig = StreamSig(1, n, 1024000.0)
    bound = wfm_receiver().bind(sig)
    rng = np.random.default_rng(0)
    xs = (rng.standard_normal((6, 1, n)) + 1j * rng.standard_normal((6, 1, n))
          ).astype(np.complex64)

    # Straight-through run.
    state = bound.init_state()
    state, ys_all = scan(bound, bound.params, state, jnp.asarray(xs))

    # Run half, checkpoint, restore, run the rest.
    state2 = bound.init_state()
    state2, ys_a = scan(bound, bound.params, state2, jnp.asarray(xs[:3]))
    path = tmp_path / "mid.npz"
    save_state(str(path), state2)
    restored = load_state(str(path))
    _, ys_b = scan(bound, bound.params, restored, jnp.asarray(xs[3:]))

    np.testing.assert_array_equal(np.asarray(ys_all[:3]), np.asarray(ys_a))
    np.testing.assert_array_equal(np.asarray(ys_all[3:]), np.asarray(ys_b))


def test_phase_mode_resampler_checkpoint_resume(tmp_path):
    """Phase-mode (arbitrary-chunk) resampler state — an int32 grid-phase
    leaf plus the Kw-1 history slab — must round-trip bit-exactly and
    resume MID-SCHEDULE: the restored run's padded chunks and valid
    prefixes continue exactly where the checkpoint left off."""
    from radiorust_tpu.blocks.resampling import Downsampler
    sig = StreamSig(1, 100, 1024.0)            # 100 % 8 != 0 -> phase mode
    bound = Downsampler(384.0, 200.0).bind(sig)
    assert bound.phase_mode
    rng = np.random.default_rng(3)
    xs = (rng.standard_normal((6, 1, 100))
          + 1j * rng.standard_normal((6, 1, 100))).astype(np.complex64)

    state = bound.init_state()
    state, ys_all = scan(bound, bound.params, state, jnp.asarray(xs))

    state2 = bound.init_state()
    state2, ys_a = scan(bound, bound.params, state2, jnp.asarray(xs[:3]))
    path = tmp_path / "phase.npz"
    save_state(str(path), state2)
    restored = load_state(str(path))
    assert restored["phase"].dtype == np.int32
    # Mid-schedule phase: 3 chunks of 100 = 300 inputs, 300 mod 8 = 4.
    assert int(np.asarray(restored["phase"])[0]) == 300 % 8
    _, ys_b = scan(bound, bound.params, restored, jnp.asarray(xs[3:]))
    np.testing.assert_array_equal(np.asarray(ys_all[:3]), np.asarray(ys_a))
    np.testing.assert_array_equal(np.asarray(ys_all[3:]), np.asarray(ys_b))
    # The host-side schedule mirror restores mid-schedule too.
    assert bound.schedule_phase(restored) == 300 % 8


def test_empty_containers_roundtrip(tmp_path):
    """Empty containers must survive serialization (a stateless block's ()
    state mid-chain must not shift later blocks' states left)."""
    tree = (np.arange(3, dtype=np.float32), (), {"k": []},
            [np.float32(1.5), ()])
    path = tmp_path / "empty.npz"
    save_state(str(path), tree)
    got = load_state(str(path))
    assert isinstance(got, tuple) and len(got) == 4
    np.testing.assert_array_equal(got[0], tree[0])
    assert got[1] == ()
    assert got[2] == {"k": []}
    assert isinstance(got[3], list) and len(got[3]) == 2
    assert got[3][0] == np.float32(1.5) and got[3][1] == ()


def test_resume_with_stateless_block_midchain(tmp_path):
    """Regression: a chain containing a stateless block (GainControl) in the
    middle, with gain != 1, must restore with aligned per-block states."""
    from radiorust_tpu.prelude import Chain, FmDemod, FreqShifter, GainControl

    n = 512
    sig = StreamSig(1, n, 48000.0)
    chain = Chain(FreqShifter(700.0), GainControl(0.5), FmDemod(5000.0))
    bound = chain.bind(sig)
    rng = np.random.default_rng(7)
    xs = (rng.standard_normal((4, 1, n)) + 1j * rng.standard_normal((4, 1, n))
          ).astype(np.complex64)

    state = bound.init_state()
    state, ys_all = scan(bound, bound.params, state, jnp.asarray(xs))

    state2 = bound.init_state()
    state2, ys_a = scan(bound, bound.params, state2, jnp.asarray(xs[:2]))
    path = tmp_path / "mid.npz"
    save_state(str(path), state2)
    restored = load_state(str(path))
    _, ys_b = scan(bound, bound.params, restored, jnp.asarray(xs[2:]))

    np.testing.assert_array_equal(np.asarray(ys_all[:2]), np.asarray(ys_a))
    np.testing.assert_array_equal(np.asarray(ys_all[2:]), np.asarray(ys_b))


def test_graph_state_roundtrip(tmp_path):
    """BoundGraph state (tuple with () leaves for input nodes) checkpoints
    and resumes bit-exactly mid-stream."""
    import jax.numpy as jnp
    from radiorust_tpu.blocks.graph import graph_scan
    from radiorust_tpu.models.wfm import wfm_receiver_graph
    from radiorust_tpu.blocks.base import StreamSig

    sig = StreamSig(1, 2048, 1024000.0)
    bg = wfm_receiver_graph().bind(sig)
    rng = np.random.default_rng(0)
    xs = (rng.standard_normal((4, 1, 2048))
          + 1j * rng.standard_normal((4, 1, 2048))).astype(np.complex64)

    st, ys_a = graph_scan(bg, bg.params, bg.init_state(),
                          {"iq": jnp.asarray(xs[:2])})
    path = str(tmp_path / "graph_state.npz")
    import jax
    save_state(path, jax.tree.map(np.asarray, st))
    st2 = load_state(path)
    _, ys_b = graph_scan(bg, bg.params, st2, {"iq": jnp.asarray(xs[2:])})
    _, ys_full = graph_scan(bg, bg.params, bg.init_state(),
                            {"iq": jnp.asarray(xs)})
    for k in ("audio", "spectrum"):
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(ys_a[k]), np.asarray(ys_b[k])]),
            np.asarray(ys_full[k]))


def test_runtime_block_checkpoint_resume(tmp_path):
    """RuntimeBlock.save_checkpoint / load_checkpoint: a fresh actor (new
    process in real use; see the cross-process drive in the repo's verify
    recipe) resumes the stream bit-exactly, with no Warmup event and no
    state reset on the first resumed chunk."""
    import asyncio

    from radiorust_tpu.blocks.transform import FreqShifter
    from radiorust_tpu.blocks.filters import Filter
    from radiorust_tpu.blocks.base import Chain
    from radiorust_tpu.runtime import ArraySink, RuntimeBlock
    from radiorust_tpu.runtime.flow import new_sender
    from radiorust_tpu.signal import Samples, Warmup

    def spec():
        return Chain(FreqShifter.with_shift(1000.0),
                     Filter.new(lambda b, f: np.where(np.abs(f) <= 200.0,
                                                      1.0, 0.0)))

    rng = np.random.default_rng(3)
    xs = (rng.standard_normal((6, 256))
          + 1j * rng.standard_normal((6, 256))).astype(np.complex64)

    async def drive(chunks, ckpt_in=None, ckpt_out=None):
        sender, connector = new_sender()
        blk = RuntimeBlock(spec())
        if ckpt_in is not None:
            blk.load_checkpoint(ckpt_in)
        sink = ArraySink()
        blk.feed_from(type("P", (), {"sender_connector": connector})())
        sink.feed_from(blk)
        events = []
        guard = sink.on_event(events.append)
        for c in chunks:
            await sender.send(Samples(8000.0, c))
        for _ in range(500):
            if len(sink.chunks) >= len(chunks):
                break
            await asyncio.sleep(0.01)
        if ckpt_out is not None:
            blk.save_checkpoint(ckpt_out)
        guard.unregister()
        return np.concatenate(sink.chunks), events

    def run(coro):
        return asyncio.run(coro)

    full, _ = run(drive(list(xs)))
    path = str(tmp_path / "actor.npz")
    first, ev_a = run(drive(list(xs[:3]), ckpt_out=path))
    rest, ev_b = run(drive(list(xs[3:]), ckpt_in=path))

    np.testing.assert_array_equal(np.concatenate([first, rest]), full)
    # The fresh (cold) actor emits Warmup; the resumed actor must not.
    assert any(isinstance(e, Warmup) for e in ev_a)
    assert not any(isinstance(e, Warmup) for e in ev_b)


def test_bare_root_leaf_round_trips(tmp_path):
    """A scalar params leaf at the tree ROOT (GainControl/FmDemod-style
    np.float32 params) must round-trip — the root-leaf name previously
    parsed as a container kind and load_state crashed."""
    from radiorust_tpu.utils.checkpoint import load_state, save_state

    p = tmp_path / "leaf.npz"
    save_state(str(p), np.float32(0.25))
    got = load_state(str(p))
    assert got == np.float32(0.25)

    save_state(str(p), np.complex64(1 + 2j))      # complex root scalar
    assert load_state(str(p)) == np.complex64(1 + 2j)


def test_extensionless_path_round_trips(tmp_path):
    """save_state('/x/wfm.ckpt') must land at exactly that path: np.savez
    alone appends .npz when the extension is missing, but np.load does
    not, so the save/load pair previously broke for such paths."""
    from radiorust_tpu.utils.checkpoint import load_state, save_state

    p = tmp_path / "wfm.ckpt"              # no .npz extension
    state = {"prev": np.arange(4, dtype=np.complex64)}
    save_state(str(p), state)
    assert p.exists()
    got = load_state(str(p))
    np.testing.assert_array_equal(got["prev"], state["prev"])


def test_random_pytrees_round_trip(tmp_path):
    """Property test over the wire format: random nested containers
    (dicts/lists/tuples, empty containers, bare leaves, scalar and n-d
    leaves, complex/float/int/bool dtypes) must round-trip exactly —
    the two bugs found so far (dropped empty containers, crashing root
    leaves) were both shape-of-tree cases a generator covers."""
    from radiorust_tpu.utils.checkpoint import load_state, save_state

    rng = np.random.default_rng(42)
    dtypes = [np.complex64, np.float32, np.float64, np.int32, np.bool_]

    def leaf():
        dt = dtypes[rng.integers(len(dtypes))]
        shape = tuple(rng.integers(1, 4, size=rng.integers(0, 3)))
        if dt == np.complex64:
            a = (rng.standard_normal(shape)
                 + 1j * rng.standard_normal(shape))
        else:
            a = rng.standard_normal(shape) * 10
        v = a.astype(dt)
        return dt(v[()]) if shape == () else v

    def tree(depth):
        kind = rng.integers(6)
        if depth == 0 or kind >= 3:
            return leaf()
        n = int(rng.integers(0, 4))  # 0 => empty container
        children = [tree(depth - 1) for _ in range(n)]
        if kind == 0:
            return {f"k{i}": c for i, c in enumerate(children)}
        return children if kind == 1 else tuple(children)

    def assert_same(a, b, path="root"):
        assert type(a) is type(b) or (np.isscalar(a) and np.isscalar(b)) \
            or (isinstance(a, np.ndarray) and isinstance(b, np.ndarray)), \
            (path, type(a), type(b))
        if isinstance(a, dict):
            assert sorted(a) == sorted(b), path
            for k in a:
                assert_same(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, (list, tuple)):
            assert len(a) == len(b), (path, len(a), len(b))
            for i, (x, y) in enumerate(zip(a, b)):
                assert_same(x, y, f"{path}[{i}]")
        else:
            aa, bb = np.asarray(a), np.asarray(b)
            assert aa.dtype == bb.dtype, (path, aa.dtype, bb.dtype)
            assert aa.shape == bb.shape, (path, aa.shape, bb.shape)
            np.testing.assert_array_equal(aa, bb, err_msg=path)

    for case in range(25):
        t = tree(3)
        p = tmp_path / f"t{case}.npz"
        save_state(str(p), t)
        assert_same(t, load_state(str(p)))


# ---------------------------------------------------------------------------
# Sharded executors (VERDICT r2 item 7): the operational checkpoint story
# for exactly the deployments the parallel layer exists for.
# ---------------------------------------------------------------------------

def _group(xs, d):
    """[S*D, b, n] chunk stream -> per-step [b, D*n] group inputs."""
    s = xs.shape[0] // d
    b, n = xs.shape[1], xs.shape[2]
    return [np.moveaxis(xs[i * d:(i + 1) * d], 0, 1).reshape(b, d * n)
            for i in range(s)]


def test_time_sharded_checkpoint_resume(tmp_path):
    """TimeShardedChain state saved mid-stream restores bit-exactly —
    including restoring a *sequential* scan's checkpoint onto the mesh
    (the state pytree is identical by construction), the scale-up
    migration path."""
    import jax
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.time_shard import TimeShardedChain

    d = 4
    mesh = jax.make_mesh((d,), ("t",))
    sig = StreamSig(2, 2048, 1024000.0)
    bound = wfm_receiver().bind(sig)
    ts = TimeShardedChain(bound, mesh)
    xs = (np.random.default_rng(5).standard_normal((4 * d, 2, 2048))
          + 1j * np.random.default_rng(6).standard_normal((4 * d, 2, 2048))
          ).astype(np.complex64)
    groups = _group(xs, d)

    # Uninterrupted sharded run.
    state = ts.init_state()
    want = []
    for g in groups:
        state, y = ts.process(ts.params, state, jnp.asarray(g))
        want.append(np.asarray(y))

    # Run half, checkpoint, restore into a FRESH executor, run the rest.
    state = ts.init_state()
    got = []
    for g in groups[:2]:
        state, y = ts.process(ts.params, state, jnp.asarray(g))
        got.append(np.asarray(y))
    path = str(tmp_path / "ts.npz")
    save_state(path, jax.tree.map(np.asarray, state))
    ts2 = TimeShardedChain(wfm_receiver().bind(sig), mesh)
    state2 = load_state(path)
    for g in groups[2:]:
        state2, y = ts2.process(ts2.params, state2, jnp.asarray(g))
        got.append(np.asarray(y))
    np.testing.assert_array_equal(np.stack(got), np.stack(want))

    # Scale-up migration: a sequential scan's checkpoint (2 chunks = half
    # a group) has the same pytree; restored on the mesh it must continue
    # exactly where the scan left off.
    seq_state, seq_y = scan(bound, bound.params, bound.init_state(),
                            jnp.asarray(xs[:d]))
    save_state(path, jax.tree.map(np.asarray, seq_state))
    state3 = load_state(path)
    state3, y = ts.process(ts.params, state3, jnp.asarray(groups[1]))
    np.testing.assert_array_equal(np.asarray(y), want[1])


def test_channel_sharded_checkpoint_resume(tmp_path):
    """ChannelShardedChain (non-actor) mid-stream save/restore, plus
    layout migration to/from the sequential chain state."""
    import jax
    from jax.sharding import Mesh
    from radiorust_tpu.models.channelizer import channelized_receiver
    from radiorust_tpu.parallel.channel_shard import ChannelShardedChain

    mesh = Mesh(np.array(jax.devices()[:4]), ("c",))
    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(2, 1024, 1024000.0)
    bound = chain.bind(sig)
    cs = ChannelShardedChain(bound, mesh, axis="c")
    rng = np.random.default_rng(11)
    xs = (rng.standard_normal((4, 2, 1024))
          + 1j * rng.standard_normal((4, 2, 1024))).astype(np.complex64)

    state = cs.init_state()
    want = []
    for x in xs:
        state, y = cs.process(cs.params, state, jnp.asarray(x))
        want.append(np.asarray(y))

    state = cs.init_state()
    got = []
    for x in xs[:2]:
        state, y = cs.process(cs.params, state, jnp.asarray(x))
        got.append(np.asarray(y))
    path = str(tmp_path / "cs.npz")
    save_state(path, jax.tree.map(np.asarray, state))
    cs2 = ChannelShardedChain(chain.bind(sig), mesh, axis="c")
    state2 = load_state(path)
    for x in xs[2:]:
        state2, y = cs2.process(cs2.params, state2, jnp.asarray(x))
        got.append(np.asarray(y))
    np.testing.assert_array_equal(np.stack(got), np.stack(want))

    # Layout migration: sequential chain state -> sharded layout and back.
    # Sharded and sequential reassociate float sums (the DFT grouping), so
    # the comparison is the tolerance + signal-power row guard of
    # test_channel_shard, not bit equality — a wrong reshape layout would
    # scramble channels and blow far past it.
    _, seq_full = scan(bound, bound.params, bound.init_state(),
                       jnp.asarray(xs))
    seq_full = np.asarray(seq_full)
    power = np.abs(seq_full).mean(axis=(0, 2))
    rows = power > 1e-3
    seq_state, _ = scan(bound, bound.params, bound.init_state(),
                        jnp.asarray(xs[:2]))
    mig = cs.state_from_chain(jax.tree.map(np.asarray, seq_state))
    mig2, y = cs.process(cs.params, mig, jnp.asarray(xs[2]))
    np.testing.assert_allclose(np.asarray(y)[rows], seq_full[2][rows],
                               atol=5e-4)
    back = cs.state_to_chain(mig2)
    _, seq_y = scan(bound, bound.params,
                    jax.tree.map(jnp.asarray, back), jnp.asarray(xs[3:]))
    np.testing.assert_allclose(np.asarray(seq_y)[0][rows],
                               seq_full[3][rows], atol=5e-4)


def test_pipelined_checkpoint_resume_midstream(tmp_path):
    """PipelinedChain.save_checkpoint captures stage states AND the
    in-flight inter-stage chunks; a fresh pipeline (new process in real
    use) resumes with zero sample loss, bit-exact vs uninterrupted."""
    import jax
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.pipeline import PipelinedChain
    from radiorust_tpu.blocks.base import unpack_wire

    sig = StreamSig(2, 2048, 1024000.0)
    chain = wfm_receiver()
    rng = np.random.default_rng(21)
    xs = (rng.standard_normal((8, 2, 2048))
          + 1j * rng.standard_normal((8, 2, 2048))).astype(np.complex64)

    want = PipelinedChain(chain.bind(sig)).run(xs)

    pl = PipelinedChain(chain.bind(sig))
    got = []
    # Push 5 chunks: with depth 7 the pipeline is mid-fill, several chunks
    # in flight, none emitted yet — the hardest point to checkpoint.
    for t in range(5):
        y = pl.push(xs[t])
        if y is not None:
            got.append(unpack_wire(jax.device_get(y)))
    assert pl.depth > 5 and not got      # genuinely mid-fill
    path = str(tmp_path / "pl.ckpt")
    pl.save_checkpoint(path)

    pl2 = PipelinedChain(chain.bind(sig))
    pl2.load_checkpoint(path)
    for t in range(5, 8):
        y = pl2.push(xs[t])
        if y is not None:
            got.append(unpack_wire(jax.device_get(y)))
    for _ in range(pl2.depth - 1):       # drain
        y = pl2.push(None)
        if y is not None:
            got.append(unpack_wire(jax.device_get(y)))
    np.testing.assert_array_equal(np.stack(got), want)

    # Partition mismatch is rejected, not silently misassigned.
    import pytest
    bad = PipelinedChain(chain.bind(sig), devices=jax.devices()[:2])
    with pytest.raises(ValueError):
        bad.load_checkpoint(path)


def test_sharded_checkpoint_roundtrip_time_mesh(tmp_path):
    # Orbax-backed sharded checkpoint (utils/checkpoint.py save_sharded/
    # load_sharded): a TimeShardedChain's mesh-resident carry saves from
    # its device shards and restores replicated onto the mesh; the
    # continuation is bit-exact vs the uninterrupted run.  (The
    # multi-PROCESS form of this — every host writing only its
    # addressable shards — runs as fake-cluster case 4,
    # tools/fake_cluster.py / tests/test_multiprocess.py.)
    import jax

    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    from radiorust_tpu.utils.checkpoint import load_sharded, save_sharded

    mesh = jax.make_mesh((8,), ("t",))
    n = 2048
    sig = StreamSig(2, n, 1024000.0)
    ts = TimeShardedChain(wfm_receiver().bind(sig), mesh)
    rng = np.random.default_rng(3)
    xs = [(rng.standard_normal((2, 8 * n))
           + 1j * rng.standard_normal((2, 8 * n))).astype(np.complex64)
          for _ in range(4)]

    st = ts.init_state()
    for x in xs[:2]:
        st, _ = ts.process(ts.params, st, x)
    path = str(tmp_path / "sharded_ckpt")
    save_sharded(path, st)
    st2 = load_sharded(path, ts.init_state(), mesh=mesh)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s1, s2 = st, st2
    for x in xs[2:]:
        s1, y1 = ts.process(ts.params, s1, x)
        s2, y2 = ts.process(ts.params, s2, x)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_sharded_checkpoint_scale_down_migration(tmp_path):
    # Scale-down migration: a checkpoint written by the 8-device
    # time-sharded executor restores onto a SINGLE device (mesh=None)
    # and the plain sequential scan continues — time-shard state is
    # mesh-agnostic (sharding is a property of the program, not the
    # state), so deployments move between topologies.  Same-executor
    # resume is bit-exact (tests above); ACROSS executors the programs
    # differ in XLA fusion/fma rounding, so the continuation agrees to
    # f32 ulps, like every sharded-vs-sequential comparison.
    import jax

    from radiorust_tpu.blocks.base import pack_wire, unpack_wire
    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    from radiorust_tpu.utils.checkpoint import load_sharded, save_sharded

    mesh = jax.make_mesh((8,), ("t",))
    n = 2048
    sig = StreamSig(2, n, 1024000.0)
    ts = TimeShardedChain(wfm_receiver().bind(sig), mesh)
    rng = np.random.default_rng(4)
    xs = [(rng.standard_normal((2, 8 * n))
           + 1j * rng.standard_normal((2, 8 * n))).astype(np.complex64)
          for _ in range(3)]

    st = ts.init_state()
    for x in xs[:2]:
        st, _ = ts.process(ts.params, st, x)
    st, y_want = ts.process(ts.params, st, xs[2])
    path = str(tmp_path / "migrate_ckpt")
    # (save happens from the pre-final state in a real migration; redo)
    st2 = ts.init_state()
    for x in xs[:2]:
        st2, _ = ts.process(ts.params, st2, x)
    save_sharded(path, st2)

    bound = wfm_receiver().bind(sig)
    st_seq = load_sharded(path, bound.init_state())
    outs = []
    for k in range(8):  # the group = 8 sequential chunks
        st_seq, y = bound.process(bound.params, st_seq,
                                  xs[2][:, k * n:(k + 1) * n],
                                  np.zeros((2,), bool))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=-1),
                               np.asarray(y_want), atol=1e-5)


def test_sharded_checkpoint_scale_up_migration(tmp_path):
    # Scale-UP migration (the reverse of the test above): a checkpoint
    # written by the plain SEQUENTIAL executor restores onto the 8-device
    # time-sharded mesh and the sharded run continues — proving
    # deployments can grow as well as shrink.  Cross-executor, so the
    # continuation agrees to f32 ulps, not bits.
    import jax

    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    from radiorust_tpu.utils.checkpoint import load_sharded, save_sharded

    mesh = jax.make_mesh((8,), ("t",))
    n = 2048
    sig = StreamSig(2, n, 1024000.0)
    bound = wfm_receiver().bind(sig)
    rng = np.random.default_rng(12)
    xs = [(rng.standard_normal((2, 8 * n))
           + 1j * rng.standard_normal((2, 8 * n))).astype(np.complex64)
          for _ in range(3)]

    # Sequential run over the first two groups' worth of chunks; save.
    st_seq = bound.init_state()
    for x in xs[:2]:
        for k in range(8):
            st_seq, y = bound.process(bound.params, st_seq,
                                      jnp.asarray(x[:, k * n:(k + 1) * n]),
                                      np.zeros((2,), bool))
    # Sequential reference continuation for the third group.
    st_ref, outs = st_seq, []
    for k in range(8):
        st_ref, y = bound.process(bound.params, st_ref,
                                  jnp.asarray(xs[2][:, k * n:(k + 1) * n]),
                                  np.zeros((2,), bool))
        outs.append(np.asarray(y))
    y_want = np.concatenate(outs, axis=-1)

    path = str(tmp_path / "scaleup_ckpt")
    save_sharded(path, jax.tree.map(np.asarray, st_seq))

    ts = TimeShardedChain(wfm_receiver().bind(sig), mesh)
    st8 = load_sharded(path, ts.init_state(), mesh=mesh)
    _, y_got = ts.process(ts.params, st8, xs[2])
    np.testing.assert_allclose(np.asarray(y_got), y_want, atol=1e-5)


def test_sharded_checkpoint_channel_scale_up(tmp_path):
    # c=4 -> c=8 migration: a channel-sharded executor's Orbax checkpoint
    # restores onto a WIDER channel mesh (the state pytree is
    # layout-identical — sharding is a property of the program), and the
    # c=8 continuation matches the c=4 one.  Both executors reassociate
    # the same chain math, so the comparison carries the channel-shard
    # tolerance + signal-power row guard of test_channel_shard.
    import jax
    from jax.sharding import Mesh

    from radiorust_tpu.models.channelizer import channelized_receiver
    from radiorust_tpu.parallel.channel_shard import ChannelShardedChain
    from radiorust_tpu.utils.checkpoint import load_sharded, save_sharded

    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    sig = StreamSig(2, 1024, 1024000.0)
    mesh4 = Mesh(np.array(jax.devices()[:4]), ("c",))
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("c",))
    cs4 = ChannelShardedChain(chain.bind(sig), mesh4, axis="c")
    cs8 = ChannelShardedChain(chain.bind(sig), mesh8, axis="c")
    rng = np.random.default_rng(13)
    xs = (rng.standard_normal((4, 2, 1024))
          + 1j * rng.standard_normal((4, 2, 1024))).astype(np.complex64)

    st = cs4.init_state()
    for x in xs[:2]:
        st, _ = cs4.process(cs4.params, st, jnp.asarray(x))
    # c=4 reference continuation.
    st_ref, want = st, []
    for x in xs[2:]:
        st_ref, y = cs4.process(cs4.params, st_ref, jnp.asarray(x))
        want.append(np.asarray(y))

    path = str(tmp_path / "chan_scaleup_ckpt")
    save_sharded(path, st)
    st8 = load_sharded(path, cs8.init_state(), mesh=mesh8)
    got = []
    for x in xs[2:]:
        st8, y = cs8.process(cs8.params, st8, jnp.asarray(x))
        got.append(np.asarray(y))

    power = np.abs(np.stack(want)).mean(axis=(0, 2))
    rows = power > 1e-3
    for w, g in zip(want, got):
        np.testing.assert_allclose(g[rows], w[rows], atol=5e-4)
