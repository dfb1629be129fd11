"""Buffer pool: zero-copy splits and storage recycling
(semantics of ``src/bufferpool.rs``)."""

import numpy as np

from radiorust_tpu.bufferpool import Chunk, ChunkBufPool


def test_chunk_views_and_splits():
    c = Chunk.from_array(np.arange(10, dtype=np.complex64))
    assert len(c) == 10
    head = c.separate_beginning(4)
    rest = c.discard_beginning(4)
    np.testing.assert_array_equal(np.asarray(head), np.arange(4))
    np.testing.assert_array_equal(np.asarray(rest), np.arange(4, 10))
    # Zero-copy: views share storage.
    assert head.data.base is c.data.base or head.data.base is not None


def test_pool_recycles_storage():
    pool = ChunkBufPool(np.complex64)
    buf = pool.get_with_capacity(64)
    buf.extend(np.ones(32, np.complex64))
    chunk = buf.finalize()
    assert len(chunk) == 32
    assert pool.allocated == 1
    del chunk  # last view dropped -> storage returns to pool
    buf2 = pool.get_with_capacity(16)
    assert pool.recycled == 1
    assert pool.allocated == 1  # reused, not newly allocated


def test_chunkbuf_grows():
    pool = ChunkBufPool(np.float32)
    buf = pool.get()
    for _ in range(10):
        buf.extend(np.ones(7, np.float32))
    c = buf.finalize()
    assert len(c) == 70
    np.testing.assert_array_equal(np.asarray(c), np.ones(70))


def test_runtime_mapsignal():
    import asyncio
    from radiorust_tpu.runtime import ArraySink, ArraySource, MapSignal
    from radiorust_tpu.signal import Samples

    async def main():
        src = ArraySource(np.arange(8, dtype=np.complex64), 4, 1000.0)
        def double(msg):
            if isinstance(msg, Samples):
                return Samples(msg.sample_rate, msg.chunk * 2)
            return msg
        ms = MapSignal(double)
        sink = ArraySink()
        ms.feed_from(src)
        sink.feed_from(ms)
        for _ in range(200):
            await asyncio.sleep(0.02)
            if len(sink.samples) >= 8:
                break
        np.testing.assert_array_equal(
            sink.samples, np.arange(8, dtype=np.complex64) * 2)

    asyncio.run(asyncio.wait_for(main(), 20))


def test_nop_block():
    import jax.numpy as jnp
    from radiorust_tpu.blocks.base import StreamSig
    from radiorust_tpu.blocks.transform import Nop
    b = Nop().bind(StreamSig(1, 8, 48000.0))
    x = np.arange(8, dtype=np.complex64)[None, :]
    _, y = b(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y), x)


def test_chunk_array_copy_isolation():
    """np.array(chunk, copy=True)/__array__(copy=True) must not alias the
    pooled backing storage shared with sibling zero-copy chunks."""
    from radiorust_tpu.bufferpool import Chunk
    base = Chunk.from_array(np.arange(8, dtype=np.complex64))
    head = base.separate_beginning(4)
    arr = head.__array__(copy=True)
    arr[:] = -1.0
    np.testing.assert_array_equal(
        np.asarray(base), np.arange(8, dtype=np.complex64))
    # Default (no copy requested) stays a zero-copy view.
    view = head.__array__()
    assert view.base is not None
