"""Matmul-based FFT (four-step / Bailey) for the TPU MXU.

XLA's FFT HLO on TPU runs far below the hardware's matmul throughput
(measured ~0.3 TFLOP/s effective for the 12288-point transforms the WFM
filters need, vs ~90 TFLOP/s for batched matmuls).  Factoring N = n1*n2
turns the DFT into two batched matrix multiplications plus a twiddle:

    x[n], n = i2 + n2*i1          (reshape [n1, n2], C order)
    T[k1, i2]  = sum_i1 x[i1, i2] * exp(-2pi i * i1 k1 / n1)   (MXU matmul)
    T2[k1, i2] = T[k1, i2] * exp(-2pi i * i2 k1 / N)           (twiddle)
    Y[k1, k2]  = sum_i2 T2[k1, i2] * exp(-2pi i * i2 k2 / n2)  (MXU matmul)
    X[k1 + n1*k2] = Y[k1, k2]                                  (transpose)

This does O(N*(n1+n2)) work instead of O(N log N) — a deliberate
FLOPs-for-MXU trade that wins by an order of magnitude on TPU for the
chunk sizes SDR pipelines use.  Complex arithmetic is expanded into real
matmuls (the backend's complex support is uneven); all constants are
embedded as float32 planes.

Use :func:`fft` / :func:`ifft`; they fall back to ``jnp.fft`` when N has no
useful factorization or is tiny.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from radiorust_tpu import config

__all__ = ["fft", "ifft", "plan_factors"]


def plan_factors(n: int):
    """Pick n1*n2 == n with both factors as close as possible (and >= 8).

    Returns None when no balanced factorization exists (prime or near-prime
    n) — callers then fall back to the native FFT.
    """
    best = None
    i = int(math.isqrt(n))
    while i >= 8:
        if n % i == 0 and n // i >= 8:
            best = (i, n // i)
            break
        i -= 1
    return best


@functools.lru_cache(maxsize=64)
def _constants(n: int, inverse: bool):
    n1, n2 = plan_factors(n)
    sign = 2.0 if inverse else -2.0
    k1 = np.arange(n1)
    d1 = np.exp(sign * 1j * np.pi * np.outer(k1, k1) / n1)
    k2 = np.arange(n2)
    d2 = np.exp(sign * 1j * np.pi * np.outer(k2, k2) / n2)
    i2 = np.arange(n2)
    tw = np.exp(sign * 1j * np.pi * np.outer(k1, i2) / n)
    def planes(m):
        return (m.real.astype(np.float32), m.imag.astype(np.float32))
    return planes(d1), planes(d2), planes(tw)


def _cmatmul(ar, ai, br, bi, contract):
    """Complex matmul via real einsums (MXU path).

    Multi-pass precision (config.matmul_precision, default HIGHEST): the
    MXU's single-pass bf16 rounding costs ~3e-3 relative error on a
    12288-point transform — outside the f32 SNR bound the framework
    guarantees against the reference.  The multi-pass f32-accurate mode
    keeps the MXU win while preserving SNR.  config.complex_mm_3mul
    selects the Gauss 3-multiplication form (25% fewer MXU FLOPs).
    """
    kw = dict(preferred_element_type=jnp.float32,
              precision=config.matmul_precision())
    rr = jnp.einsum(contract, ar, br, **kw)
    ii = jnp.einsum(contract, ai, bi, **kw)
    if config.complex_mm_3mul():
        m3 = jnp.einsum(contract, ar + ai, br + bi, **kw)
        return rr - ii, m3 - rr - ii
    ri = jnp.einsum(contract, ar, bi, **kw)
    ir = jnp.einsum(contract, ai, br, **kw)
    return rr - ii, ri + ir


def _matfft(x: jax.Array, inverse: bool) -> jax.Array:
    n = x.shape[-1]
    n1, n2 = plan_factors(n)
    (d1r, d1i), (d2r, d2i), (twr, twi) = _constants(n, inverse)
    lead = x.shape[:-1]
    xr = jnp.real(x).reshape(*lead, n1, n2)
    xi = jnp.imag(x).reshape(*lead, n1, n2)
    # Stage 1: contract the n1 axis with DFT_n1 -> [.., k1, i2]
    tr, ti = _cmatmul(xr, xi, jnp.asarray(d1r), jnp.asarray(d1i),
                      "...ij,ki->...kj")
    # Twiddle.
    twr_, twi_ = jnp.asarray(twr), jnp.asarray(twi)
    ur = tr * twr_ - ti * twi_
    ui = tr * twi_ + ti * twr_
    # Stage 2: contract the i2 axis with DFT_n2 -> [.., k1, k2]
    yr, yi = _cmatmul(ur, ui, jnp.asarray(d2r), jnp.asarray(d2i),
                      "...kj,jl->...kl")
    # Output index k = k1 + n1*k2 -> transpose to [k2, k1] then flatten.
    yr = jnp.swapaxes(yr, -1, -2).reshape(*lead, n)
    yi = jnp.swapaxes(yi, -1, -2).reshape(*lead, n)
    if inverse:
        scale = np.float32(1.0 / n)
        yr = yr * scale
        yi = yi * scale
    return jax.lax.complex(yr, yi)


def fft(x: jax.Array, use_matmul: bool = True) -> jax.Array:
    """DFT along the last axis; matmul four-step when factorable.

    complex128 inputs (the f64 stream validation mode, CPU backend) take
    the native FFT — the matmul path's constants and accumulators are
    f32 by design."""
    n = x.shape[-1]
    if (use_matmul and n >= 1024 and plan_factors(n) is not None
            and x.dtype != jnp.complex128):
        return _matfft(x, inverse=False)
    return jnp.fft.fft(x)


def ifft(x: jax.Array, use_matmul: bool = True) -> jax.Array:
    """Inverse DFT along the last axis."""
    n = x.shape[-1]
    if (use_matmul and n >= 1024 and plan_factors(n) is not None
            and x.dtype != jnp.complex128):
        return _matfft(x, inverse=True)
    return jnp.fft.ifft(x)
