"""Flat re-export of the common API surface (``src/prelude.rs`` analog)."""

from .blocks.analysis import Fourier
from .blocks.base import (Block, BoundBlock, Chain, StreamSig, jit_step,
                          make_scan, pack_wire, scan, unpack_wire)
from .blocks.channelize import Channelizer
from .blocks.frontend import MixerDecimator
from .blocks.chunks import Overlapper, rechunk
from .blocks.filters import (Filter, SlewRateLimiter, deemphasis_factor)
from .blocks.modulation import FmDemod, FmMod
from .blocks.morse import Keyer, Speed, encode
from .blocks.resampling import Downsampler, Upsampler
from .blocks.transform import FreqShifter, GainControl, MapSample
from .metering import bandwidth, bandwidth_jax, level, level_jax, \
    rescale_energy, rescale_energy_jax
from .signal import (BufferOverflow, Disconnection, Event, Samples,
                     SamplesLost, Warmup)
from .windowing import CustomWindow, Kaiser, Rectangular, Window

__all__ = [
    "Block", "BoundBlock", "Chain", "StreamSig", "jit_step", "make_scan",
    "scan", "pack_wire", "unpack_wire",
    "Fourier", "Channelizer", "MixerDecimator", "Overlapper", "rechunk",
    "Filter", "SlewRateLimiter", "deemphasis_factor",
    "FmDemod", "FmMod", "Keyer", "Speed", "encode",
    "Downsampler", "Upsampler", "FreqShifter", "GainControl", "MapSample",
    "bandwidth", "bandwidth_jax", "level", "level_jax",
    "rescale_energy", "rescale_energy_jax",
    "Event", "Samples", "Disconnection", "SamplesLost", "BufferOverflow",
    "Warmup",
    "Kaiser", "Rectangular", "CustomWindow", "Window",
]
