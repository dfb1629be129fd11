"""Direct unit tests for the fused Pallas frontend/demod kernels
(interpreter mode) against the unfused formulations."""

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

import radiorust_tpu.ops.pallas_filter as pfl
import radiorust_tpu.ops.pallas_frontend as pfe
from radiorust_tpu.blocks.transform import _shift_tables
from radiorust_tpu.ops.polyphase import plan_downsample, rational_fir


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pfe.pl, "pallas_call", interp)
    monkeypatch.setattr(pfl.pl, "pallas_call", interp)


@pytest.mark.parametrize("out_rate,bw,n", [
    (384000.0, 200000.0, 2048),    # WFM frontend ratio 8:3
    # bw_meter 10:1 — p does not divide 128 lanes; exercises the r4
    # super-row generalization of the fused mixer+decimator.
    (102400.0, 50000.0, 10240),
])
def test_fused_mix_decimate_matches_unfused(out_rate, bw, n):
    batch = 4
    plan = plan_downsample(1024000.0, out_rate, bw)
    p, q, hist = plan.p, plan.q, plan.hist
    ta, tb, _ = _shift_tables(n, 1024000, 100000)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((batch, n))
         + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    h = (rng.standard_normal((batch, hist))
         + 1j * rng.standard_normal((batch, hist))).astype(np.complex64)
    p0 = np.exp(1j * rng.standard_normal(batch)).astype(np.complex64)
    osc = (ta[:, None] * tb[None, :]).reshape(n)
    mixed = x * osc[None, :] * p0[:, None]
    xp = np.concatenate([h, mixed], axis=-1)
    want = np.asarray(rational_fir(jnp.asarray(xp), jnp.asarray(plan.kernel),
                                   p, q, plan.s0, (n // p) * q))
    outr, outi, nhr, nhi = pfe.fused_mix_decimate(
        jnp.asarray(x.real), jnp.asarray(x.imag),
        jnp.asarray(ta.real), jnp.asarray(ta.imag),
        jnp.asarray(tb.real), jnp.asarray(tb.imag),
        jnp.asarray(p0.real), jnp.asarray(p0.imag),
        jnp.asarray(h.real), jnp.asarray(h.imag),
        plan.kernel, p, q)
    got = np.asarray(outr) + 1j * np.asarray(outi)
    np.testing.assert_allclose(got, want, atol=5e-5)
    np.testing.assert_allclose(np.asarray(nhr) + 1j * np.asarray(nhi),
                               xp[:, -hist:], atol=1e-6)


def test_atan2_poly_precision():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(100000).astype(np.float32)
    b = rng.standard_normal(100000).astype(np.float32)
    got = np.asarray(pfl._atan2_poly(jnp.asarray(b), jnp.asarray(a)))
    np.testing.assert_allclose(got, np.arctan2(b, a), atol=5e-7)
    assert float(pfl._atan2_poly(jnp.float32(0), jnp.float32(0))) == 0.0


def test_fused_demod_filter_matches_blocks():
    from radiorust_tpu.blocks.base import Chain, StreamSig, scan
    from radiorust_tpu.blocks.filters import Filter, design_response
    from radiorust_tpu.blocks.modulation import FmDemod
    from radiorust_tpu.models.wfm import _deemphasis_band
    from radiorust_tpu.windowing import Rectangular

    batch, n, rate, dev = 4, 2048, 384000.0, 150000.0
    factor = rate / dev / (2 * np.pi)
    rng = np.random.default_rng(2)
    ph = np.cumsum(rng.standard_normal((batch, 3 * n)) * 0.3, axis=-1)
    x = np.exp(1j * ph).astype(np.complex64)
    chunks = x.reshape(batch, 3, n).transpose(1, 0, 2)

    chain = Chain(FmDemod(dev), Filter.new_rectangular(_deemphasis_band))
    b = chain.bind(StreamSig(batch, n, rate))
    for blk in b.blocks:
        blk.input_is_real = False
    _, want = scan(b, b.params, b.init_state(), jnp.asarray(chunks))
    want = np.asarray(want)

    resp = design_response(_deemphasis_band, Rectangular(), n,
                           rate).astype(np.complex64)
    gr, gi = pfl.response_to_grid(resp)
    plr = np.zeros(batch, np.float32)
    pli = np.zeros(batch, np.float32)
    prevd = np.zeros((batch, n), np.float32)
    last = np.zeros(batch, np.float32)
    have = np.zeros(batch, np.float32)
    outs = []
    for t in range(3):
        cur = chunks[t]
        y, d = pfl.fused_demod_filter(
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(plr), jnp.asarray(pli), jnp.asarray(prevd),
            jnp.asarray(last), jnp.asarray(have),
            jnp.asarray(gr), jnp.asarray(gi), factor)
        y, d = np.asarray(y), np.asarray(d)
        outs.append(y)
        plr = cur.real[:, -1].astype(np.float32)
        pli = cur.imag[:, -1].astype(np.float32)
        prevd, last = d, d[:, -1]
        have = np.ones(batch, np.float32)
    got = np.stack(outs)
    np.testing.assert_allclose(got, want.real, atol=2e-5)


def test_fused_filter_demod_filter_matches_composition():
    """The merged filter+demod+filter kernel equals the composition of the
    separate fused kernels (fused_overlap_save then fused_demod_filter)
    over several chunks, including the continuity state handoff."""
    from radiorust_tpu.blocks.filters import design_response
    from radiorust_tpu.models.wfm import _deemphasis_band, _lowpass_100k
    from radiorust_tpu.windowing import Kaiser, Rectangular

    batch, n, rate, dev = 4, 2048, 384000.0, 150000.0
    factor = rate / dev / (2 * np.pi)
    rng = np.random.default_rng(5)
    ph = np.cumsum(rng.standard_normal((batch, 3 * n)) * 0.3, axis=-1)
    x = np.exp(1j * ph).astype(np.complex64)
    chunks = x.reshape(batch, 3, n).transpose(1, 0, 2)

    r1 = design_response(_lowpass_100k, Kaiser.with_null_at_bin(2.0), n,
                         rate).astype(np.complex64)
    r2 = design_response(_deemphasis_band, Rectangular(), n,
                         rate).astype(np.complex64)
    g1r, g1i = pfl.response_to_grid(r1)
    g2r, g2i = pfl.response_to_grid(r2)

    # Reference: separate kernels with hand-carried state.
    prev = np.zeros((batch, n), np.complex64)
    plr = pli = last = have = np.zeros(batch, np.float32)
    prevd = np.zeros((batch, n), np.float32)
    want = []
    for t in range(3):
        cur = chunks[t]
        fr, fi = pfl.fused_overlap_save(
            jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(g1r), jnp.asarray(g1i))
        fr, fi = np.asarray(fr), np.asarray(fi)
        y, d = pfl.fused_demod_filter(
            jnp.asarray(fr), jnp.asarray(fi),
            jnp.asarray(plr), jnp.asarray(pli), jnp.asarray(prevd),
            jnp.asarray(last), jnp.asarray(have),
            jnp.asarray(g2r), jnp.asarray(g2i), factor)
        y, d = np.asarray(y), np.asarray(d)
        want.append(y)
        prev = cur
        plr, pli = fr[:, -1], fi[:, -1]
        prevd, last = d, d[:, -1]
        have = np.ones(batch, np.float32)

    # Merged kernel.
    prev = np.zeros((batch, n), np.complex64)
    plr = pli = last = have = np.zeros(batch, np.float32)
    prevd = np.zeros((batch, n), np.float32)
    got = []
    for t in range(3):
        cur = chunks[t]
        y, d, flr, fli = pfl.fused_filter_demod_filter(
            jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(plr), jnp.asarray(pli), jnp.asarray(prevd),
            jnp.asarray(last), jnp.asarray(have),
            jnp.asarray(g1r), jnp.asarray(g1i),
            jnp.asarray(g2r), jnp.asarray(g2i), factor)
        y, d = np.asarray(y), np.asarray(d)
        got.append(y)
        prev = cur
        plr, pli = np.asarray(flr), np.asarray(fli)
        prevd, last = d, d[:, -1]
        have = np.ones(batch, np.float32)

    np.testing.assert_allclose(np.stack(got), np.stack(want), atol=2e-5)


@pytest.mark.parametrize("rates,n", [
    ((384000.0, 48000.0, 40000.0), 6144),   # WFM tail: 295-tap window, q=1
    ((1024000.0, 384000.0, 200000.0), 2048),  # frontend ratio: q=3
    # bw_meter 10:1 — p does not divide 128 lanes; exercises the
    # lcm(p,128)=640-lane super-row layout.
    ((1024000.0, 102400.0, 50000.0), 10240),
])
def test_pallas_decimate_matches_rational_fir(rates, n):
    in_rate, out_rate, bw = rates
    batch = 4
    plan = plan_downsample(in_rate, out_rate, bw)
    assert pfe.decimate_supported(n, plan)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((batch, n))
         + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    h = (rng.standard_normal((batch, plan.hist))
         + 1j * rng.standard_normal((batch, plan.hist))).astype(np.complex64)
    out_len = plan.out_len(n)
    xp = np.concatenate([h, x], axis=-1)
    want = np.asarray(rational_fir(jnp.asarray(xp), jnp.asarray(plan.kernel),
                                   plan.p, plan.q, plan.s0, out_len))
    outs, newhs = pfe.pallas_decimate(
        (jnp.asarray(x.real), jnp.asarray(x.imag)),
        (jnp.asarray(h.real), jnp.asarray(h.imag)),
        jnp.asarray(plan.kernel), plan.p, plan.q)
    got = np.asarray(outs[0]) + 1j * np.asarray(outs[1])
    np.testing.assert_allclose(got, want, atol=5e-5)
    np.testing.assert_allclose(np.asarray(newhs[0]) + 1j * np.asarray(newhs[1]),
                               xp[:, -plan.hist:], atol=1e-6)


def test_pallas_decimate_real_single_plane():
    plan = plan_downsample(384000.0, 48000.0, 40000.0)
    n, batch = 6144, 2
    rng = np.random.default_rng(4)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    h = rng.standard_normal((batch, plan.hist)).astype(np.float32)
    out_len = plan.out_len(n)
    xp = np.concatenate([h, x], axis=-1).astype(np.complex64)
    want = np.asarray(rational_fir(jnp.asarray(xp), jnp.asarray(plan.kernel),
                                   plan.p, plan.q, plan.s0, out_len,
                                   real_input=True)).real
    outs, _ = pfe.pallas_decimate((jnp.asarray(x),), (jnp.asarray(h),),
                                  jnp.asarray(plan.kernel), plan.p, plan.q)
    np.testing.assert_allclose(np.asarray(outs[0]), want, atol=5e-5)
