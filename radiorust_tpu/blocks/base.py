"""Block protocol and chain composition.

The reference wires independent Tokio tasks with capacity-1 channels
(``src/blocks/mod.rs:23-34``, ``src/flow.rs``).  The TPU build replaces that
dynamic actor graph with *declarative block specs*:

- A :class:`Block` is a lightweight spec (constructor args only).
- ``block.bind(sig)`` resolves it against a stream signature
  ``(batch, chunk_len, sample_rate)`` and performs all host-side design work
  (filter responses, resampler taps, phase tables) — the analog of the
  reference recomputing designs when sample rate / chunk length change
  (``src/blocks/filters.rs:179-239``).
- The resulting :class:`BoundBlock` carries ``params`` (a pytree of traced,
  retunable values — the analog of ``tokio::sync::watch`` tunables), an
  ``init_state()`` pytree (the cross-chunk streaming state: filter tails,
  demod previous sample, oscillator phase, resampler history), and a pure
  ``process(params, state, x, reset)`` function.
- :class:`Chain` composes blocks sequentially; a bound chain is itself a
  bound block whose ``process`` is the fused composition — ``jax.jit`` then
  compiles the whole chain into one XLA program, and ``scan`` runs it over a
  stacked batch of chunks with ``lax.scan`` carrying all state.

``reset`` is a per-stream bool ``[batch]`` implementing the reference's
interrupt-event semantics (stateful blocks drop continuity state on
``is_interrupt()`` events, e.g. ``src/blocks/filters.rs:262-268``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StreamSig", "Block", "BoundBlock", "Chain", "scan", "jit_step"]


@dataclass(frozen=True)
class StreamSig:
    """Static signature of a chunked stream.

    ``batch`` independent streams (channels), each delivering chunks of
    ``chunk_len`` complex64 samples at ``sample_rate`` Hz.  The analog of the
    reference's per-message ``(sample_rate, chunk.len())`` pair
    (``src/signal.rs:170-183``), made static so XLA sees fixed shapes.
    """

    batch: int
    chunk_len: int
    sample_rate: float

    def with_(self, **kw) -> "StreamSig":
        return dataclasses.replace(self, **kw)


class Block:
    """Declarative spec for a signal-processing block."""

    def bind(self, sig: StreamSig) -> "BoundBlock":
        raise NotImplementedError


class BoundBlock:
    """A block resolved against a stream signature.

    Subclasses set ``in_sig`` / ``out_sig`` and ``params`` and implement
    ``init_state`` / ``process``.
    """

    in_sig: StreamSig
    out_sig: StreamSig
    params: Any = ()

    def init_state(self):
        return ()

    def process(self, params, state, x, reset):
        """Pure step: (params, state, x[batch, chunk_len], reset[batch])
        -> (state', y[batch, out_chunk_len])."""
        raise NotImplementedError

    # -- convenience -------------------------------------------------------

    def __call__(self, x, *, state=None, reset=None, params=None):
        """Eager single-step helper (mainly for tests)."""
        if state is None:
            state = self.init_state()
        if params is None:
            params = self.params
        if reset is None:
            reset = jnp.zeros((self.in_sig.batch,), dtype=bool)
        return self.process(params, state, x, reset)


class _BoundChain(BoundBlock):
    def __init__(self, bound: Sequence[BoundBlock]):
        self.blocks = tuple(bound)
        self.in_sig = bound[0].in_sig
        self.out_sig = bound[-1].out_sig
        self.params = tuple(b.params for b in bound)

    def init_state(self):
        return tuple(b.init_state() for b in self.blocks)

    def process(self, params, state, x, reset):
        new_state = []
        for block, p, s in zip(self.blocks, params, state):
            s, x = block.process(p, s, x, reset)
            new_state.append(s)
        return tuple(new_state), x


class Chain(Block):
    """Sequential composition of blocks.

    The analog of ``feed_from`` wiring in the reference
    (``src/flow.rs:255-273``), but static: binding resolves each block's
    output signature into the next block's input signature, and the composed
    ``process`` is a single pure function XLA fuses end-to-end.
    """

    def __init__(self, *blocks: Block):
        self.specs = blocks

    def bind(self, sig: StreamSig) -> _BoundChain:
        bound = []
        for spec in self.specs:
            b = spec.bind(sig)
            bound.append(b)
            sig = b.out_sig
        return _BoundChain(bound)


def jit_step(bound: BoundBlock) -> Callable:
    """Jit-compile one chunk step of a bound block/chain."""

    @jax.jit
    def step(params, state, x, reset):
        return bound.process(params, state, x, reset)

    return step


def scan(bound: BoundBlock, params, state, xs, resets=None):
    """Run a bound block over stacked chunks with ``lax.scan``.

    ``xs``: [T, batch, chunk_len] complex64.  ``resets``: optional [T, batch]
    bool.  Returns (final_state, ys[T, batch, out_chunk_len]).  This is the
    compiled replacement for the reference's per-chunk recv/process/send task
    loop (``src/blocks/mod.rs:193-239``).
    """
    batch = bound.in_sig.batch
    if resets is None:
        resets = jnp.zeros((xs.shape[0], batch), dtype=bool)

    def body(state, inp):
        x, reset = inp
        state, y = bound.process(params, state, x, reset)
        return state, y

    return jax.lax.scan(body, state, (xs, resets))


def no_reset(batch: int):
    return jnp.zeros((batch,), dtype=bool)
