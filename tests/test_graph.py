"""Compiled DAG graphs: fan-out taps, multiple inputs, and scan must match
the equivalent chains run separately (shared prefixes computed once)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radiorust_tpu.blocks.analysis import Fourier
from radiorust_tpu.blocks.base import Chain, StreamSig, scan
from radiorust_tpu.blocks.filters import Filter
from radiorust_tpu.blocks.graph import Graph, graph_scan
from radiorust_tpu.blocks.modulation import FmDemod
from radiorust_tpu.blocks.transform import FreqShifter, GainControl


def lowpass(cut):
    def resp(bins, freqs):
        return np.where(np.abs(freqs) <= cut, 1.0 + 0.0j, 0.0j)
    return resp


def make_iq(t, batch, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((t, batch, n))
            + 1j * rng.standard_normal((t, batch, n))).astype(np.complex64)


def run_chain(chain, sig, xs):
    bound = chain.bind(sig)
    _, ys = scan(bound, bound.params, bound.init_state(), jnp.asarray(xs))
    return np.asarray(ys)


def test_fanout_tap_matches_separate_chains():
    """shift -> {filter -> 'a', fourier -> 'b'}: each output equals the
    corresponding linear chain; the shared shift runs once in one program."""
    sig = StreamSig(2, 64, 8000.0)
    g = Graph()
    src = g.input("iq")
    mid = g.add(FreqShifter.with_shift(500.0), src)
    g.output("a", g.add(Filter.new(lowpass(2000.0)), mid))
    g.output("b", g.add(Fourier(), mid))
    bg = g.bind(sig)

    xs = make_iq(4, 2, 64, seed=1)
    _, ys = graph_scan(bg, bg.params, bg.init_state(), {"iq": jnp.asarray(xs)})
    want_a = run_chain(Chain(FreqShifter.with_shift(500.0),
                             Filter.new(lowpass(2000.0))), sig, xs)
    want_b = run_chain(Chain(FreqShifter.with_shift(500.0), Fourier()),
                       sig, xs)
    np.testing.assert_allclose(np.asarray(ys["a"]), want_a, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ys["b"]), want_b, atol=2e-4)


def test_graph_chain_helper_and_valid_from():
    """Graph.chain() composes like Chain; warmup (valid_from) accumulates
    per path, matching _BoundChain's cumulative rule."""
    sig = StreamSig(2, 64, 8000.0)
    g = Graph()
    src = g.input("iq")
    end = g.chain([FreqShifter.with_shift(500.0),
                   Filter.new(lowpass(2000.0)),
                   Filter.new(lowpass(1500.0))], src)
    g.output("y", end)
    bg = g.bind(sig)
    bound = Chain(FreqShifter.with_shift(500.0), Filter.new(lowpass(2000.0)),
                  Filter.new(lowpass(1500.0))).bind(sig)
    assert bg.valid_from["y"] == bound.valid_from
    xs = make_iq(3, 2, 64, seed=2)
    _, ys = graph_scan(bg, bg.params, bg.init_state(), {"iq": jnp.asarray(xs)})
    _, want = scan(bound, bound.params, bound.init_state(), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(ys["y"]), np.asarray(want),
                               atol=2e-4)


def test_multiple_inputs_one_program():
    sig1 = StreamSig(2, 64, 8000.0)
    sig2 = StreamSig(1, 128, 16000.0)
    g = Graph()
    a = g.input("a")
    b = g.input("b")
    g.output("ya", g.add(GainControl(0.25), a))
    g.output("yb", g.add(FmDemod(1000.0), b))
    bg = g.bind({"a": sig1, "b": sig2})
    xa = make_iq(3, 2, 64, seed=3)
    xb = make_iq(3, 1, 128, seed=4)
    _, ys = graph_scan(bg, bg.params, bg.init_state(),
                       {"a": jnp.asarray(xa), "b": jnp.asarray(xb)})
    np.testing.assert_allclose(np.asarray(ys["ya"]),
                               run_chain(Chain(GainControl(0.25)), sig1, xa),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(ys["yb"]),
                               run_chain(Chain(FmDemod(1000.0)), sig2, xb),
                               atol=2e-4)


def test_reset_routed_per_input():
    """Reset masks are routed to the nodes fed by that input only."""
    sig = StreamSig(2, 64, 8000.0)
    g = Graph()
    a = g.input("a")
    b = g.input("b")
    g.output("ya", g.add(FmDemod(1000.0), a))
    g.output("yb", g.add(FmDemod(1000.0), b))
    bg = g.bind({"a": sig, "b": sig})
    xa = make_iq(4, 2, 64, seed=5)
    xb = make_iq(4, 2, 64, seed=6)
    ra = np.zeros((4, 2), bool)
    ra[2, 0] = True
    rb = np.zeros((4, 2), bool)
    _, ys = graph_scan(bg, bg.params, bg.init_state(),
                       {"a": jnp.asarray(xa), "b": jnp.asarray(xb)},
                       {"a": jnp.asarray(ra), "b": jnp.asarray(rb)})
    bound = Chain(FmDemod(1000.0)).bind(sig)
    _, want_a = scan(bound, bound.params, bound.init_state(),
                     jnp.asarray(xa), jnp.asarray(ra))
    _, want_b = scan(bound, bound.params, bound.init_state(),
                     jnp.asarray(xb), jnp.asarray(rb))
    np.testing.assert_allclose(np.asarray(ys["ya"]), np.asarray(want_a),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(ys["yb"]), np.asarray(want_b),
                               atol=2e-4)


def test_channelizer_tap_batch_growth():
    """A batch-growing node (PFB channelizer) mid-graph: reset mask
    expansion and downstream batch bookkeeping follow the Chain rule."""
    from radiorust_tpu.blocks.channelize import Channelizer
    sig = StreamSig(1, 1024, 1024000.0)
    g = Graph()
    src = g.input("iq")
    ch = g.add(Channelizer(64), src)
    g.output("chans", g.add(GainControl(0.5), ch))
    bg = g.bind(sig)
    assert bg.out_sigs["chans"].batch == 64
    xs = make_iq(3, 1, 1024, seed=7)
    _, ys = graph_scan(bg, bg.params, bg.init_state(), {"iq": jnp.asarray(xs)})
    want = run_chain(Chain(Channelizer(64), GainControl(0.5)), sig, xs)
    np.testing.assert_allclose(np.asarray(ys["chans"]), want, atol=2e-4)


def test_realness_propagates_through_graph():
    """FmDemod output is real; a downstream real-coefficient Filter should
    see input_is_real exactly as it does in a Chain."""
    sig = StreamSig(2, 64, 8000.0)
    g = Graph()
    src = g.input("iq")
    d = g.add(FmDemod(1000.0), src)
    tap = g.add(Filter.new(lowpass(2000.0)), d)
    g.output("y", tap)
    bg = g.bind(sig)
    chain_bound = Chain(FmDemod(1000.0),
                        Filter.new(lowpass(2000.0))).bind(sig)
    assert (bg.bound[2].input_is_real
            == chain_bound.blocks[1].input_is_real is True)
    xs = make_iq(4, 2, 64, seed=8)
    _, ys = graph_scan(bg, bg.params, bg.init_state(), {"iq": jnp.asarray(xs)})
    _, want = scan(chain_bound, chain_bound.params,
                   chain_bound.init_state(), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(ys["y"]), np.asarray(want),
                               atol=2e-4)


def test_graph_validation_errors():
    g = Graph()
    a = g.input("a")
    with pytest.raises(ValueError):
        g.input("a")
    with pytest.raises(ValueError):
        g.add(GainControl(1.0), "not-a-ref")
    g.output("y", g.add(GainControl(1.0), a))
    with pytest.raises(ValueError):
        g.output("y", a)
    with pytest.raises(ValueError):
        g.bind({})  # missing input sig
    g2 = Graph()
    g2.input("x")
    with pytest.raises(ValueError):
        g2.bind(StreamSig(1, 64, 8000.0))  # no outputs


def test_graph_jit_single_program():
    """The whole DAG compiles and runs as one jitted program."""
    sig = StreamSig(2, 64, 8000.0)
    g = Graph()
    src = g.input("iq")
    mid = g.add(FreqShifter.with_shift(500.0), src)
    g.output("a", g.add(GainControl(2.0), mid))
    g.output("b", g.add(FmDemod(1000.0), mid))
    bg = g.bind(sig)
    step = jax.jit(lambda p, s, x: bg.process(p, s, {"iq": x}))
    x = make_iq(1, 2, 64, seed=9)[0]
    st, ys = step(bg.params, bg.init_state(), jnp.asarray(x))
    assert set(ys) == {"a", "b"}
    assert ys["a"].shape == (2, 64)
