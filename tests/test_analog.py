"""End-to-end tests for the AM / SSB receiver models."""

import numpy as np
import jax.numpy as jnp

from radiorust_tpu.blocks.base import StreamSig, scan
from radiorust_tpu.models.analog import (ANALOG_AUDIO_CHUNK,
                                         ANALOG_AUDIO_RATE,
                                         ANALOG_INPUT_CHUNK,
                                         ANALOG_INPUT_RATE, am_receiver,
                                         ssb_receiver)

RATE = ANALOG_INPUT_RATE
N = ANALOG_INPUT_CHUNK
# The Downsampler keeps its anti-alias FIR at unit *energy* (the
# reference's normalization, src/blocks/resampling.rs:96-99), so a pure
# tone's amplitude grows by sqrt(input_rate / output_rate).
RESAMPLE_GAIN = np.sqrt(RATE / ANALOG_AUDIO_RATE)


def run_chain(chain, sig, chunks):
    b = chain.bind(sig)
    state, ys = scan(b, b.params, b.init_state(), jnp.asarray(chunks))
    return np.asarray(ys), b


def tone_audio(out, skip_chunks=3):
    """Settled mono audio + its spectrum peak frequency."""
    audio = out[:, 0, :].reshape(-1)
    settled = audio[skip_chunks * ANALOG_AUDIO_CHUNK:]
    win = settled.real * np.hanning(len(settled))
    spec = np.abs(np.fft.fft(win))
    freqs = np.fft.fftfreq(len(settled), 1.0 / ANALOG_AUDIO_RATE)
    return settled, abs(freqs[np.argmax(spec)])


def synth_am(audio_freq, t_chunks, f_off=30000.0, amp=0.8, mod=0.5):
    t = np.arange(t_chunks * N) / RATE
    audio = np.sin(2 * np.pi * audio_freq * t)
    iq = amp * (1.0 + mod * audio) * np.exp(2j * np.pi * f_off * t)
    return iq.astype(np.complex64).reshape(t_chunks, 1, N)


def synth_ssb_tone(audio_freq, t_chunks, f_off=30000.0, amp=0.5, lsb=False):
    # A single audio tone transmitted SSB is one complex exponential offset
    # from the suppressed carrier by +-audio_freq.
    t = np.arange(t_chunks * N) / RATE
    sign = -1.0 if lsb else 1.0
    iq = amp * np.exp(2j * np.pi * (f_off + sign * audio_freq) * t)
    return iq.astype(np.complex64).reshape(t_chunks, 1, N)


def test_am_receiver_end_to_end():
    amp, mod = 0.8, 0.5
    iq = synth_am(1000.0, 8, amp=amp, mod=mod)
    sig = StreamSig(1, N, RATE)
    ys, bound = run_chain(am_receiver(tune_shift=-30000.0), sig, iq)
    assert bound.out_sig.sample_rate == ANALOG_AUDIO_RATE
    assert bound.out_sig.chunk_len == ANALOG_AUDIO_CHUNK
    assert bound.output_is_real
    settled, peak = tone_audio(ys)
    assert abs(peak - 1000.0) < 20.0, f"peak at {peak} Hz"
    # Envelope detection recovers amp*mod*sin: check the RMS level.
    want_rms = RESAMPLE_GAIN * amp * mod / np.sqrt(2.0)
    got_rms = float(np.sqrt(np.mean(settled.real ** 2)))
    assert abs(got_rms - want_rms) < 0.1 * want_rms
    # The real_output promise holds numerically.
    assert float(np.abs(settled.imag).max()) < 1e-6


def test_am_receiver_batch():
    # Two stations with different program audio through one program.
    iq1 = synth_am(700.0, 6)
    iq2 = synth_am(1700.0, 6)
    iq = np.concatenate([iq1, iq2], axis=1)
    ys, _ = run_chain(am_receiver(tune_shift=-30000.0),
                      StreamSig(2, N, RATE), iq)
    for ch, want in ((0, 700.0), (1, 1700.0)):
        _, peak = tone_audio(ys[:, ch:ch + 1])
        assert abs(peak - want) < 20.0, f"ch{ch} peak at {peak} Hz"


def test_ssb_usb_end_to_end():
    amp = 0.5
    iq = synth_ssb_tone(1500.0, 8, amp=amp, lsb=False)
    sig = StreamSig(1, N, RATE)
    ys, bound = run_chain(ssb_receiver(tune_shift=-30000.0), sig, iq)
    assert bound.output_is_real
    settled, peak = tone_audio(ys)
    assert abs(peak - 1500.0) < 20.0, f"peak at {peak} Hz"
    # One-sided filter gain 2 then Re(): tone comes back at 2*amp/sqrt(2).
    want_rms = RESAMPLE_GAIN * 2.0 * amp / np.sqrt(2.0)
    got_rms = float(np.sqrt(np.mean(settled.real ** 2)))
    assert abs(got_rms - want_rms) < 0.1 * want_rms


def test_ssb_lsb_end_to_end():
    iq = synth_ssb_tone(1500.0, 8, lsb=True)
    sig = StreamSig(1, N, RATE)
    ys, _ = run_chain(ssb_receiver(tune_shift=-30000.0, lsb=True), sig, iq)
    settled, peak = tone_audio(ys)
    assert abs(peak - 1500.0) < 20.0, f"peak at {peak} Hz"


def test_am_receiver_agc_rides_out_fading():
    # The carrier amplitude drops 6 dB mid-stream; with agc=True the
    # program audio level stays put (a manual GainControl would halve).
    t_chunks = 16
    t = np.arange(t_chunks * N) / RATE
    fade = np.where(t < t_chunks * N // 2 / RATE, 0.8, 0.4)
    audio = np.sin(2 * np.pi * 1000.0 * t)
    iq = (fade * (1.0 + 0.5 * audio) * np.exp(2j * np.pi * 30000.0 * t)
          ).astype(np.complex64).reshape(t_chunks, 1, N)
    ys, _ = run_chain(am_receiver(tune_shift=-30000.0, agc=True),
                      StreamSig(1, N, RATE), iq)
    out = ys[:, 0, :].reshape(-1).real
    half = len(out) // 2
    rms_before = np.sqrt(np.mean(out[half - 4096:half] ** 2))
    rms_after = np.sqrt(np.mean(out[-4096:] ** 2))
    assert abs(rms_after / rms_before - 1.0) < 0.15, (rms_before, rms_after)


def test_am_ssb_example_runs():
    # Live-runtime smoke test: both receivers fan out from one SDR source.
    import os
    import pathlib
    import subprocess
    import sys
    repo = pathlib.Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "examples" / "am_ssb_receiver.py")],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""},
    )
    assert "AM  program tone: 1000 Hz" in r.stdout, r.stdout + r.stderr
    assert "SSB program tone: 1500 Hz" in r.stdout, r.stdout + r.stderr


def test_ssb_opposite_sideband_rejection():
    # An LSB-side tone into a USB receiver must be suppressed by the
    # one-sided filter's stopband.
    sig = StreamSig(1, N, RATE)
    usb, _ = run_chain(ssb_receiver(tune_shift=-30000.0), sig,
                       synth_ssb_tone(1500.0, 8, lsb=False))
    rej, _ = run_chain(ssb_receiver(tune_shift=-30000.0), sig,
                       synth_ssb_tone(1500.0, 8, lsb=True))
    usb_rms = np.sqrt(np.mean(tone_audio(usb)[0].real ** 2))
    rej_rms = np.sqrt(np.mean(tone_audio(rej)[0].real ** 2))
    assert rej_rms < 0.02 * usb_rms, (rej_rms, usb_rms)


def test_isb_receiver_decodes_both_sidebands():
    """ISB: two distinct programs on the two sidebands of ONE carrier,
    decoded simultaneously through a shared-transform FilterBank; each
    output matches the standalone ssb_receiver tuned to that sideband."""
    from radiorust_tpu.blocks.graph import graph_scan
    from radiorust_tpu.models.analog import isb_receiver

    t_chunks, f_off = 8, 30000.0
    usb_tone, lsb_tone = 1000.0, 2000.0
    iq = (synth_ssb_tone(usb_tone, t_chunks, f_off=f_off)
          + synth_ssb_tone(lsb_tone, t_chunks, f_off=f_off, lsb=True))
    sig = StreamSig(1, N, RATE)

    g = isb_receiver(tune_shift=-f_off).bind({"iq": sig})
    _, ys = graph_scan(g, g.params, g.init_state(),
                       {"iq": jnp.asarray(iq)})
    usb, lsb = np.asarray(ys["usb"]), np.asarray(ys["lsb"])
    _, usb_peak = tone_audio(usb)
    _, lsb_peak = tone_audio(lsb)
    assert abs(usb_peak - usb_tone) < 40.0, usb_peak
    assert abs(lsb_peak - lsb_tone) < 40.0, lsb_peak

    # Per-band equality with the standalone filter-method receivers
    # (shared-transform linearity of the bank).
    for name, lsb_flag, got in (("usb", False, usb), ("lsb", True, lsb)):
        want, _ = run_chain(ssb_receiver(tune_shift=-f_off, lsb=lsb_flag),
                            sig, iq)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-5,
                                   err_msg=name)
