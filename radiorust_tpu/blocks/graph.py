"""Compiled DAG graphs: fan-out taps in one fused XLA program.

The reference has no central graph object — its "graph" is whichever
``Sender``/``Receiver`` pairs are connected, and one producer may feed any
number of consumers in lock-step (``src/flow.rs:44-52``).  ``Chain`` covers
the linear case on the compiled path; this module covers the general DAG:
declare named inputs, add blocks with explicit upstream nodes (a node may
feed many downstream nodes — the broadcast analog), name the outputs, and
``bind`` compiles the whole DAG into a single pure ``process`` that XLA
fuses end-to-end.  Shared prefixes are computed once, unlike wiring two
separate chains.

Typical use — a WFM receiver that also taps the channel spectrum off the
front end (the reference's relm_app plays audio while the GUI observes the
spectrum):

    g = Graph()
    iq = g.input("iq")
    front = g.add(Downsampler(384000.0, 200000.0),
                  g.add(FreqShifter.with_shift(0.0), iq))
    g.output("audio", g.add(audio_tail, front))
    g.output("spectrum", g.add(Fourier(), front))
    bg = g.bind({"iq": StreamSig(1, 16384, 1024000.0)})
    state, ys = bg.process(bg.params, state, {"iq": x})   # ys["audio"], ...
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

from .base import Block, BoundBlock, StreamSig, expand_reset

__all__ = ["Graph", "BoundGraph", "NodeRef", "graph_scan"]


class _BoundSelect(BoundBlock):
    """Projection of one output of a multi-output (bank) node.  Stateless
    and free at runtime — it only picks an element of the bank's output
    tuple inside the fused program."""

    def __init__(self, bank: BoundBlock, index: int):
        self.index = index
        self.in_sig = self.out_sig = bank.out_sigs[index]
        self._bank = bank

    @property
    def output_is_real(self):
        return self._bank.outputs_real[self.index]

    def process(self, params, state, xs, reset):
        return (), xs[self.index]


@dataclass(frozen=True)
class NodeRef:
    """Handle to a graph node (an input or an added block)."""
    idx: int


class Graph:
    """Declarative DAG builder.  Nodes are added in topological order by
    construction (an upstream ``NodeRef`` must already exist)."""

    def __init__(self):
        # Each entry: (kind, payload). kind "input": payload = name.
        # kind "block": payload = (Block spec, upstream idx).
        self._nodes: List[tuple] = []
        self._inputs: Dict[str, int] = {}
        self._outputs: Dict[str, int] = {}

    def input(self, name: str = "in") -> NodeRef:
        if name in self._inputs:
            raise ValueError(f"duplicate input name {name!r}")
        self._nodes.append(("input", name))
        ref = NodeRef(len(self._nodes) - 1)
        self._inputs[name] = ref.idx
        return ref

    def add(self, block: Block, upstream) -> NodeRef:
        """Add a block fed by ``upstream`` — a :class:`NodeRef`, or a
        sequence of them for fan-in blocks (the block must implement
        ``bind_multi``, e.g. :class:`~radiorust_tpu.blocks.transform.
        Combine`)."""
        if isinstance(upstream, (tuple, list)):
            ups = tuple(upstream)
            if not ups:
                raise ValueError("fan-in upstream list is empty")
            for u in ups:
                self._check_ref(u)
            if len(ups) == 1:
                self._nodes.append(("block", (block, ups[0].idx)))
            else:
                if not hasattr(block, "bind_multi"):
                    raise TypeError(
                        f"{type(block).__name__} takes one input; fan-in "
                        "nodes need a block with bind_multi (e.g. Combine)")
                self._nodes.append(
                    ("block", (block, tuple(u.idx for u in ups))))
            return NodeRef(len(self._nodes) - 1)
        self._check_ref(upstream)
        self._nodes.append(("block", (block, upstream.idx)))
        return NodeRef(len(self._nodes) - 1)

    def _check_ref(self, upstream) -> None:
        if not isinstance(upstream, NodeRef) or not (
                0 <= upstream.idx < len(self._nodes)):
            raise ValueError("upstream must be a NodeRef from this graph")
        if self._nodes[upstream.idx][0] == "bank":
            raise ValueError(
                "a bank node itself is not a stream; use the per-output "
                "NodeRefs returned by Graph.bank")

    def bank(self, block: Block, upstream: NodeRef):
        """Add a multi-output block (e.g. :class:`~radiorust_tpu.blocks.
        filters.FilterBank`) fed by ``upstream``; returns one
        :class:`NodeRef` per output.  The block must declare
        ``num_outputs`` and its bound form must set ``out_sigs`` and
        return a tuple of chunks from ``process``."""
        self._check_ref(upstream)
        k = getattr(block, "num_outputs", None)
        if not isinstance(k, int) or k < 1:
            raise TypeError(
                f"{type(block).__name__} is not a multi-output block "
                "(missing num_outputs); use Graph.add")
        self._nodes.append(("bank", (block, upstream.idx)))
        bank_idx = len(self._nodes) - 1
        refs = []
        for j in range(k):
            self._nodes.append(("select", (bank_idx, j)))
            refs.append(NodeRef(len(self._nodes) - 1))
        return tuple(refs)

    def chain(self, blocks, upstream: NodeRef) -> NodeRef:
        """Convenience: add several blocks in sequence."""
        ref = upstream
        for b in blocks:
            ref = self.add(b, ref)
        return ref

    def output(self, name: str, node: NodeRef) -> None:
        if name in self._outputs:
            raise ValueError(f"duplicate output name {name!r}")
        self._outputs[name] = node.idx

    def bind(self, sigs) -> "BoundGraph":
        """``sigs``: dict input-name -> StreamSig (or a bare StreamSig when
        the graph has exactly one input)."""
        if isinstance(sigs, StreamSig):
            if len(self._inputs) != 1:
                raise ValueError("graph has multiple inputs; pass a dict")
            sigs = {next(iter(self._inputs)): sigs}
        missing = set(self._inputs) - set(sigs)
        if missing:
            raise ValueError(f"missing input signatures: {sorted(missing)}")
        if not self._outputs:
            raise ValueError("graph has no outputs")
        return BoundGraph(self._nodes, self._inputs, self._outputs, sigs)


class BoundGraph:
    """A graph resolved against input signatures: one pure ``process`` over
    dicts of named chunks.  Mirrors :class:`BoundBlock`'s contract with
    dict-valued I/O; each node follows the same realness-propagation and
    cumulative-warmup (``valid_from``) rules as ``Chain.bind``."""

    def __init__(self, nodes, inputs: Dict[str, int],
                 outputs: Dict[str, int], sigs: Dict[str, StreamSig]):
        self._inputs = dict(inputs)
        self._outputs = dict(outputs)
        self.in_sigs = dict(sigs)

        # Per node: bound block (or None for inputs), upstream idx,
        # originating input name, out signature, realness, valid_from.
        self.bound: List[Optional[BoundBlock]] = []
        self._upstream: List[Optional[int]] = []
        self._origin: List[str] = []
        out_sig: List[StreamSig] = []
        is_real: List[bool] = []
        valid_from: List[int] = []
        for kind, payload in nodes:
            if kind == "input":
                name = payload
                self.bound.append(None)
                self._upstream.append(None)
                self._origin.append(name)
                out_sig.append(sigs[name])
                is_real.append(False)
                valid_from.append(0)
            elif kind == "bank":
                spec, up = payload
                b = spec.bind(out_sig[up])
                b.input_is_real = is_real[up]
                self.bound.append(b)
                self._upstream.append(up)
                self._origin.append(self._origin[up])
                # The bank node's value is a tuple, not a stream; only its
                # select projections are referenceable (Graph enforces it).
                out_sig.append(b.out_sig)
                is_real.append(False)
                valid_from.append(valid_from[up] + b.valid_from)
            elif kind == "select":
                bank_idx, j = payload
                b = _BoundSelect(self.bound[bank_idx], j)
                self.bound.append(b)
                self._upstream.append(bank_idx)
                self._origin.append(self._origin[bank_idx])
                out_sig.append(b.out_sig)
                is_real.append(b.output_is_real)
                valid_from.append(valid_from[bank_idx])
            else:
                spec, up = payload
                if isinstance(up, tuple):
                    # Fan-in node: bind against every upstream signature.
                    origins = {self._origin[u] for u in up}
                    if len(origins) != 1:
                        raise ValueError(
                            "fan-in upstreams must derive from one graph "
                            f"input (reset-mask origin); got {sorted(origins)}")
                    b = spec.bind_multi(tuple(out_sig[u] for u in up))
                    b.input_is_real_flags = [is_real[u] for u in up]
                    self.bound.append(b)
                    self._upstream.append(up)
                    self._origin.append(origins.pop())
                    out_sig.append(b.out_sig)
                    is_real.append(b.output_is_real)
                    valid_from.append(max(valid_from[u] for u in up)
                                      + b.valid_from)
                    continue
                b = spec.bind(out_sig[up])
                b.input_is_real = is_real[up]
                self.bound.append(b)
                self._upstream.append(up)
                self._origin.append(self._origin[up])
                out_sig.append(b.out_sig)
                is_real.append(b.output_is_real)
                valid_from.append(valid_from[up] + b.valid_from)
        for b in self.bound:
            if b is not None and getattr(b, "ragged_output", False):
                # Phase-mode resamplers emit schedule-padded chunks; a
                # graph has no per-output trim path (and downstream nodes
                # would misread padding as samples).  Re-chunk to a
                # multiple of the resampling period instead.
                raise ValueError(
                    f"{type(b).__name__} produces padded (schedule-valid) "
                    "chunks at this chunk length and cannot be a graph "
                    "node; re-chunk to a multiple of the resampling "
                    "period or serve it as a chain tail")
        self._node_sig = out_sig
        self.out_sigs = {n: out_sig[i] for n, i in self._outputs.items()}
        #: Per-output first reference-comparable chunk index.
        self.valid_from = {n: valid_from[i] for n, i in self._outputs.items()}
        self.params = tuple(() if b is None else b.params
                            for b in self.bound)

    def init_state(self):
        return tuple(() if b is None else b.init_state()
                     for b in self.bound)

    def process(self, params, state, xs: Dict[str, Any], resets=None):
        """(params, state, {input: chunk}, {input: reset[batch]}?) ->
        (state', {output: chunk})."""
        if resets is None:
            resets = {n: np.zeros((self.in_sigs[n].batch,), dtype=bool)
                      for n in self._inputs}
        vals: List[Any] = [None] * len(self.bound)
        new_state = []
        for i, b in enumerate(self.bound):
            if b is None:
                name = self._origin[i]
                vals[i] = xs[name]
                new_state.append(())
                continue
            origin = self._origin[i]
            r = expand_reset(b, resets[origin],
                             self.in_sigs[origin].batch)
            up = self._upstream[i]
            xin = (tuple(vals[u] for u in up) if isinstance(up, tuple)
                   else vals[up])
            s, y = b.process(params[i], state[i], xin, r)
            vals[i] = y
            new_state.append(s)
        ys = {n: vals[i] for n, i in self._outputs.items()}
        return tuple(new_state), ys

    def shard_batch_ok(self, ndev: int) -> bool:
        """Data-parallel stream sharding feasibility: every input batch
        splits over the mesh axis and every node's per-shard constraints
        hold on its local batch (see ``BoundBlock.shard_batch_ok``)."""
        return (all(sig.batch % ndev == 0 for sig in self.in_sigs.values())
                and all(b.shard_batch_ok(ndev) for b in self.bound
                        if b is not None))


def linear_bound_graph(bound_chain) -> BoundGraph:
    """Adapt an already-bound chain into the ``BoundGraph`` shape: input
    node "in" followed by the chain's blocks, output "out".  Node 0 (the
    input) contributes ``()`` params/state, so graph params/state are
    ``((),) + chain params/state``.  Lets graph-generic machinery (e.g.
    ``TimeShardedGraph``) serve as the single implementation for chains."""
    blocks = list(bound_chain.blocks)
    bg = BoundGraph.__new__(BoundGraph)
    bg._inputs = {"in": 0}
    bg._outputs = {"out": len(blocks)}
    bg.in_sigs = {"in": bound_chain.in_sig}
    bg.bound = [None, *blocks]
    bg._upstream = [None, *range(len(blocks))]
    bg._origin = ["in"] * (len(blocks) + 1)
    bg._node_sig = [bound_chain.in_sig] + [b.out_sig for b in blocks]
    bg.out_sigs = {"out": bound_chain.out_sig}
    bg.valid_from = {"out": bound_chain.valid_from}
    bg.params = ((), *bound_chain.params)
    return bg


def graph_scan(bg: BoundGraph, params, state, xs: Dict[str, Any],
               resets=None):
    """Scan a bound graph over stacked chunks: each ``xs[name]`` is
    [T, batch, chunk_len]; returns (final_state, {output: [T, ...]}).
    The dict analog of :func:`radiorust_tpu.blocks.base.scan`."""
    import jax

    t = next(iter(xs.values())).shape[0]
    if resets is None:
        resets = {n: np.zeros((t, bg.in_sigs[n].batch), dtype=bool)
                  for n in bg.in_sigs}

    def body(st, inp):
        x, r = inp
        st, ys = bg.process(params, st, x, r)
        return st, ys

    return jax.lax.scan(body, state, (xs, resets))
