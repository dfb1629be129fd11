"""WFM stereo decoder (beyond the mono-only reference) and graph fan-in.

The MPX layout being decoded is the broadcast standard: (L+R)/2 mono,
19 kHz pilot, (L-R)/2 DSB-SC on 38 kHz (= 2x the pilot, phase-locked).
The oracle here *synthesizes* that composite directly, so the decoder's
channel separation and level accuracy are checked against ground truth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radiorust_tpu.blocks.base import Chain, StreamSig, scan
from radiorust_tpu.blocks.filters import deemphasis_factor
from radiorust_tpu.blocks.graph import Graph, graph_scan
from radiorust_tpu.blocks.transform import Combine, GainControl, Nop
from radiorust_tpu.models.stereo import (MPX_RATE, PILOT_FREQ,
                                         stereo_mpx_decoder,
                                         wfm_stereo_receiver)

F_L = 1000.0   # left-channel test tone (an exact DFT bin of every chunk)
F_R = 2500.0   # right-channel test tone
A_L = 0.8
A_R = 0.5


def make_mpx(ts, pilot_phase=0.3, a_l=A_L, a_r=A_R):
    """Ground-truth stereo composite at sample times ``ts`` (seconds)."""
    left = a_l * np.sin(2 * np.pi * F_L * ts)
    right = a_r * np.sin(2 * np.pi * F_R * ts)
    th = 2 * np.pi * PILOT_FREQ * ts + pilot_phase
    return (0.5 * (left + right) + 0.5 * (left - right) * np.cos(2 * th)
            + 0.1 * np.cos(th))


def tone_peaks(channel, rate):
    """Windowed spectrum peaks (in bins around the two test tones)."""
    n = len(channel)
    spec = np.abs(np.fft.rfft(channel * np.hanning(n)))
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    out = []
    for f in (F_L, F_R):
        i = int(np.argmin(np.abs(freqs - f)))
        out.append(float(spec[max(i - 2, 0): i + 3].max()))
    return out


def decode_stereo(bound_graph, xs, key="stereo", skip_extra=2):
    state, ys = graph_scan(bound_graph, bound_graph.params,
                           bound_graph.init_state(), xs)
    skip = bound_graph.valid_from[key] + skip_extra
    audio = np.asarray(ys[key])[skip:, 0, :].reshape(-1)
    return audio.real, audio.imag


def test_stereo_decoder_separation_and_levels():
    n, t_chunks = 6144, 10
    ts = np.arange(t_chunks * n) / MPX_RATE
    mpx = make_mpx(ts).astype(np.complex64).reshape(t_chunks, 1, n)
    bg = stereo_mpx_decoder().bind({"mpx": StreamSig(1, n, MPX_RATE)})
    left, right = decode_stereo(bg, {"mpx": jnp.asarray(mpx)})

    l_at_fl, l_at_fr = tone_peaks(left, 48000.0)
    r_at_fl, r_at_fr = tone_peaks(right, 48000.0)
    # Channel separation: each ear contains only its own tone.
    assert 20 * np.log10(l_at_fl / (l_at_fr + 1e-9)) > 60.0
    assert 20 * np.log10(r_at_fr / (r_at_fl + 1e-9)) > 60.0
    # Level accuracy: the L/R tone ratio must match the synthesized
    # amplitudes through the (shared-path) deemphasis response.  Absolute
    # levels carry the resampler's energy-normalized passband gain
    # (reference resampler IR design, src/blocks/resampling.rs:82-101),
    # which cancels in the ratio.
    want = (A_L * abs(deemphasis_factor(50e-6, F_L))
            / (A_R * abs(deemphasis_factor(50e-6, F_R))))
    assert l_at_fl / r_at_fr == pytest.approx(want, rel=0.03)


def test_stereo_decoder_pilot_output_and_mono_fallback():
    n, t_chunks = 6144, 8
    ts = np.arange(t_chunks * n) / MPX_RATE
    mpx = make_mpx(ts).astype(np.complex64).reshape(t_chunks, 1, n)

    # Pilot tap: analytic 19 kHz tone of amplitude ~0.1.
    bg = stereo_mpx_decoder().bind({"mpx": StreamSig(1, n, MPX_RATE)})
    state, ys = graph_scan(bg, bg.params, bg.init_state(),
                           {"mpx": jnp.asarray(mpx)})
    pilot = np.asarray(ys["pilot"])[bg.valid_from["pilot"] + 1:, 0, :]
    mag = np.abs(pilot.reshape(-1))
    assert np.median(mag) == pytest.approx(0.1, rel=0.05)

    # separation=0 degrades to dual mono: both ears carry both tones
    # at identical levels (the mono matrix), no crash, no NaNs.
    bg0 = stereo_mpx_decoder(separation=0.0).bind(
        {"mpx": StreamSig(1, n, MPX_RATE)})
    left, right = decode_stereo(bg0, {"mpx": jnp.asarray(mpx)})
    np.testing.assert_allclose(left, right, atol=1e-5)
    l_at_fl, l_at_fr = tone_peaks(left, 48000.0)
    assert l_at_fl > 0 and l_at_fr > 0


def test_wfm_stereo_receiver_roundtrip():
    """Stereo composite -> FM modulator (1.024 Msps IQ) -> full stereo
    receiver graph: the tones come back on their own ears."""
    from radiorust_tpu.blocks.modulation import FmMod

    rate, n, t_chunks = 1024000.0, 16384, 8
    ts = np.arange(t_chunks * n) / rate
    # Modest amplitudes keep the FM spectrum inside the receiver's
    # +-100 kHz channel filter (Carson bandwidth ~2*(dev+53k)).
    mpx = make_mpx(ts, a_l=0.25, a_r=0.15).astype(np.complex64)
    mod = Chain(FmMod(150000.0)).bind(StreamSig(1, n, rate))
    _, iq = scan(mod, mod.params, mod.init_state(),
                 jnp.asarray(mpx.reshape(t_chunks, 1, n)))

    bg = wfm_stereo_receiver().bind({"iq": StreamSig(1, n, rate)})
    left, right = decode_stereo(bg, {"iq": jnp.asarray(iq)})
    l_at_fl, l_at_fr = tone_peaks(left, 48000.0)
    r_at_fl, r_at_fr = tone_peaks(right, 48000.0)
    assert 20 * np.log10(l_at_fl / (l_at_fr + 1e-9)) > 30.0
    assert 20 * np.log10(r_at_fr / (r_at_fl + 1e-9)) > 30.0
    want = (0.25 * abs(deemphasis_factor(50e-6, F_L))
            / (0.15 * abs(deemphasis_factor(50e-6, F_R))))
    assert l_at_fl / r_at_fr == pytest.approx(want, rel=0.10)


def test_stereo_graph_time_shards():
    """Every stereo-decoder node (filters, map, fan-in combines,
    resampler) time-shards; the sharded graph equals sequential scan."""
    from radiorust_tpu.parallel.time_shard import TimeShardedGraph

    assert len(jax.devices()) >= 8, "needs the virtual 8-device CPU mesh"

    d, steps, n = 4, 3, 1536
    sig = StreamSig(2, n, MPX_RATE)
    ts_time = np.arange(steps * d * n) / MPX_RATE
    mpx = make_mpx(ts_time)
    xs = np.stack([mpx, 0.7 * mpx]).astype(np.complex64)
    xs = np.moveaxis(xs.reshape(2, steps * d, n), 1, 0)

    bg = stereo_mpx_decoder().bind({"mpx": sig})
    _, want = graph_scan(bg, bg.params, bg.init_state(),
                         {"mpx": jnp.asarray(xs)})

    mesh = jax.make_mesh((d,), ("t",))
    tsg = TimeShardedGraph(bg, mesh, t_axis="t")
    state = tsg.init_state()
    got = {k: [] for k in bg.out_sigs}
    for s in range(steps):
        group = xs[s * d: (s + 1) * d]
        x_big = np.moveaxis(group, 0, 1).reshape(2, d * n)
        state, ys = tsg.process(tsg.params, state, {"mpx": jnp.asarray(x_big)})
        for k in got:
            out_n = bg.out_sigs[k].chunk_len
            got[k].append(np.moveaxis(
                np.asarray(ys[k]).reshape(2, d, out_n), 1, 0))
    for k in got:
        np.testing.assert_allclose(np.concatenate(got[k], axis=0),
                                   np.asarray(want[k]), atol=2e-4)


# -- Combine / fan-in mechanics ----------------------------------------------

def test_combine_fan_in_matches_manual():
    sig = StreamSig(2, 32, 8000.0)
    rng = np.random.default_rng(3)
    xs = (rng.standard_normal((3, 2, 32))
          + 1j * rng.standard_normal((3, 2, 32))).astype(np.complex64)

    g = Graph()
    src = g.input("in")
    a = g.add(GainControl(2.0), src)
    b = g.add(GainControl(-1.0), src)
    g.output("out", g.add(Combine(lambda u, v: u * jnp.conj(v)), (a, b)))
    bg = g.bind(sig)
    assert bg.valid_from["out"] == 0
    _, ys = graph_scan(bg, bg.params, bg.init_state(),
                       {"in": jnp.asarray(xs)})
    want = (2.0 * xs) * np.conj(-1.0 * xs)
    np.testing.assert_allclose(np.asarray(ys["out"]), want, atol=1e-5)


def test_combine_single_input_in_chain():
    """Degenerate linear use: Combine binds like a one-input map."""
    sig = StreamSig(1, 16, 8000.0)
    chain = Chain(Combine(lambda x: 3.0 * x)).bind(sig)
    x = np.ones((1, 16), np.complex64)
    _, y = chain.process(chain.params, chain.init_state(), x,
                         np.asarray([False]))
    np.testing.assert_allclose(np.asarray(y), 3.0 * x, atol=1e-6)


def test_fan_in_validation_errors():
    g = Graph()
    src = g.input("a")
    other = g.input("b")
    n1 = g.add(Nop(), src)
    # A one-input block cannot take a fan-in upstream list.
    with pytest.raises(TypeError):
        g.add(Nop(), (n1, src))
    # Fan-in across different graph inputs is rejected at bind (the reset
    # mask origin would be ambiguous).
    g2 = Graph()
    a = g2.input("a")
    b = g2.input("b")
    g2.output("out", g2.add(Combine(lambda u, v: u + v), (a, b)))
    with pytest.raises(ValueError, match="one graph input"):
        g2.bind({"a": StreamSig(1, 16, 8000.0),
                 "b": StreamSig(1, 16, 8000.0)})
    # Mismatched signatures are rejected.
    with pytest.raises(ValueError, match="share one signature"):
        Combine(lambda u, v: u + v).bind_multi(
            (StreamSig(1, 16, 8000.0), StreamSig(1, 32, 8000.0)))


def test_decoder_decoupled_geometry_levels():
    """The MPX decoder under the decoupled overlap-save geometry
    (filter_ir_len < chunk): all four filters keep the ir-length design,
    so the paths stay sample-aligned and channel separation holds at a
    chunk that is 3x the IR length."""
    m, n, t_chunks = 512, 1536, 6
    ts = np.arange(t_chunks * n) / MPX_RATE
    mpx = make_mpx(ts).astype(np.complex64)
    xs = {"mpx": jnp.asarray(mpx.reshape(t_chunks, 1, n))}
    g = stereo_mpx_decoder(filter_ir_len=m).bind(
        {"mpx": StreamSig(1, n, MPX_RATE)})
    left, right = decode_stereo(g, xs)
    rate = 48000.0
    l_l, l_r = tone_peaks(left, rate)
    r_l, r_r = tone_peaks(right, rate)
    # Each channel's own tone dominates the other's by the separation
    # margin (same assertion class as the coupled-geometry test).
    assert l_l > 8 * l_r and r_r > 8 * r_l
    # And the bank form equals the separate-filters form here too.
    gb = stereo_mpx_decoder(use_bank=False, filter_ir_len=m).bind(
        {"mpx": StreamSig(1, n, MPX_RATE)})
    _, ya = graph_scan(g, g.params, g.init_state(), xs)
    _, yb = graph_scan(gb, gb.params, gb.init_state(), xs)
    np.testing.assert_allclose(np.asarray(ya["stereo"]),
                               np.asarray(yb["stereo"]), atol=2e-5)


def test_decoder_bank_matches_separate_filters():
    """The FilterBank-based decoder (default) and the separate-Filter form
    (use_bank=False, kept as the benchmark reference) are the same math."""
    n, t_chunks = 1536, 4
    ts = np.arange(t_chunks * n) / MPX_RATE
    mpx = make_mpx(ts).astype(np.complex64)
    xs = {"mpx": jnp.asarray(
        np.stack([mpx, 0.6 * mpx]).reshape(2, t_chunks, n).swapaxes(0, 1))}
    sig = StreamSig(2, n, MPX_RATE)
    ga = stereo_mpx_decoder(use_bank=True).bind({"mpx": sig})
    gb = stereo_mpx_decoder(use_bank=False).bind({"mpx": sig})
    assert ga.valid_from == gb.valid_from
    _, ya = graph_scan(ga, ga.params, ga.init_state(), xs)
    _, yb = graph_scan(gb, gb.params, gb.init_state(), xs)
    for k in ya:
        np.testing.assert_allclose(np.asarray(ya[k]), np.asarray(yb[k]),
                                   atol=2e-5)
