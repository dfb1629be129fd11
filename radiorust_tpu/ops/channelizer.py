"""Polyphase filterbank channelizer.

The reference has no channelizer block — the analogous workload in its
world is N parallel (FreqShifter -> Downsampler) chains, one per channel
(cf. BASELINE.json config 5: "64-channel polyphase channelizer").  The
TPU-native design replaces N mixer+decimator chains with one critically
sampled polyphase FFT filterbank: a depthwise branch FIR (MXU-friendly
grouped convolution) followed by a batched FFT across branches — O(K + log
M) work per input sample for M channels instead of O(M * taps).

Channel ``c`` is centered at ``+c * rate / M`` (wrapping, numpy FFT bin
convention) and decimated to ``rate / M``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..math import sinc
from ..windowing import Kaiser

__all__ = ["design_prototype", "pfb_channelize"]


def design_prototype(num_channels: int, taps_per_branch: int,
                     kaiser_null_bins: float = 1.3) -> np.ndarray:
    """Windowed-sinc prototype low-pass for an M-channel filterbank.

    Length ``M * K`` taps, cutoff at half a channel spacing, Kaiser
    windowed, normalized to unit DC gain per branch sum (a tone at a
    channel center comes out at its input amplitude scaled by M from the
    branch DFT — we fold the 1/M in here so channel outputs preserve
    amplitude).
    """
    m, k = num_channels, taps_per_branch
    n = m * k
    window = Kaiser.with_null_at_bin(kaiser_null_bins * k)
    x = (np.arange(n, dtype=np.float64) + 0.5) - n / 2.0
    h = sinc(x / m) * window.relative_value_at(x * 2.0 / n)
    # Unit gain at a channel center: sum over all taps equals M * (branch
    # DC gain); normalize so the final FFT-of-branches yields amplitude 1.
    return (h / np.sum(h)).astype(np.float64)


def pfb_channelize(xp: jax.Array, taps: jax.Array,
                   num_channels: int) -> jax.Array:
    """Critically sampled analysis filterbank.

    ``xp``: [batch, hist + n] complex64 with ``hist = (K-1) * M`` history
    samples prepended (n divisible by M).
    ``taps``: [K, M] float32 — prototype reshaped so ``taps[k, m] =
    h[k*M + m]``.
    Returns [batch, M, n/M] complex64: per-channel decimated streams.
    """
    b = xp.shape[0]
    k, m = taps.shape
    total = xp.shape[-1]
    frames = xp.reshape(b, total // m, m)            # [b, T+K-1, M]
    # Depthwise causal FIR along the frame axis, one filter per branch.
    lhs = jnp.concatenate([frames.real, frames.imag], axis=0)
    lhs = jnp.swapaxes(lhs, 1, 2)                    # [2b, M, T+K-1]
    rhs = jnp.swapaxes(taps, 0, 1)[:, None, :]       # [M, 1, K]
    v = jax.lax.conv_general_dilated(
        lhs.astype(jnp.float32), rhs.astype(jnp.float32),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=m,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # f32-accurate on the MXU
    )                                                # [2b, M, T]
    vc = jax.lax.complex(v[:b], v[b:])               # [b, M, T]
    # DFT across branches -> channels (numpy bin convention).
    y = jnp.fft.fft(jnp.swapaxes(vc, 1, 2), axis=-1)  # [b, T, M]
    return jnp.swapaxes(y, 1, 2).astype(jnp.complex64)  # [b, M, T]
