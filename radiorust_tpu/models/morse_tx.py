"""Morse transmit chains.

Rebuilds the reference's morse examples as compiled chains:

- :func:`morse_audio_chain` — ``examples/morse/main.rs:4-27``:
  keyer envelope -> SlewRateLimiter(100) -> Filter low-pass 100 Hz ->
  GainControl(0.5) -> FreqShifter(+700 Hz) -> audio samples.
- :func:`morse_rf_chain` — ``examples/morse_rf/main.rs:50-98`` adds an FM
  modulator for RF transmission.

The keyer itself stays host-side (:class:`radiorust_tpu.blocks.morse.Keyer`)
— it is control logic generating the on/off envelope; the DSP runs on
device.
"""

from __future__ import annotations

import numpy as np

from ..blocks.base import Chain
from ..blocks.filters import Filter, SlewRateLimiter
from ..blocks.modulation import FmMod
from ..blocks.transform import FreqShifter, GainControl

__all__ = ["morse_audio_chain", "morse_rf_chain"]


def _lowpass(cut):
    def resp(bins, freqs):
        return np.where(np.abs(freqs) <= cut, 1.0 + 0.0j, 0.0j)
    return resp


def morse_audio_chain(tone: float = 700.0, gain: float = 0.5,
                      slew_rate: float = 100.0) -> Chain:
    """Keyer envelope -> audio tone chain (``examples/morse/main.rs``)."""
    return Chain(
        SlewRateLimiter(slew_rate),
        Filter.new(_lowpass(100.0)),
        GainControl(gain),
        FreqShifter.with_shift(tone),
    )


def morse_rf_chain(tone: float = 700.0, gain: float = 0.5,
                   slew_rate: float = 100.0,
                   deviation: float = 2500.0) -> Chain:
    """Morse chain feeding an FM modulator for RF TX
    (``examples/morse_rf/main.rs:50-98``)."""
    return Chain(
        SlewRateLimiter(slew_rate),
        Filter.new(_lowpass(100.0)),
        GainControl(gain),
        FreqShifter.with_shift(tone),
        FmMod(deviation),
    )
