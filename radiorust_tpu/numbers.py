"""Numeric policy for the TPU-native radio framework.

The reference (radiorust ``src/numbers.rs:23-42``) abstracts over f32/f64 via
a ``Float`` trait; streams run in complex f32 at every I/O boundary while
filter/IR design math runs in f64 (``src/blocks/filters.rs:165-166,188``).

The TPU build fixes the same split as a *policy* instead of a generic
parameter:

- **Stream dtype**: ``complex64`` (f32 pairs) on device — matches the
  reference's I/O precision (``src/blocks/io/rf/soapysdr.rs:35``) and is the
  native fast path on TPU (f32 VPU lanes, bf16/f32 MXU).
- **Design dtype**: ``float64`` / ``complex128`` on host (numpy) — filter
  responses, window tables, resampler taps are computed exactly like the
  reference's f64 design path and only then cast to the stream dtype.
"""

from __future__ import annotations

import numpy as np

# Device (stream) dtypes — everything that flows per-sample on TPU.
REAL_DTYPE = np.float32
COMPLEX_DTYPE = np.complex64

# Host (design) dtypes — filter design, window tables, tap generation.
DESIGN_REAL_DTYPE = np.float64
DESIGN_COMPLEX_DTYPE = np.complex128

TAU = 2.0 * np.pi


def as_stream_complex(x):
    """Cast a host design-precision array to the device stream dtype."""
    return np.asarray(x).astype(COMPLEX_DTYPE)


def as_stream_real(x):
    """Cast a host design-precision array to the device real stream dtype."""
    return np.asarray(x).astype(REAL_DTYPE)
