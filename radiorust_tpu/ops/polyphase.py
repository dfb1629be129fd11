"""Rational polyphase FIR resampling as a strided convolution.

The reference resamples with per-sample ring-buffer loops and an f64 phase
accumulator (``src/blocks/resampling.rs:103-133`` down,
``:238-267`` up) whose output count is data-dependent — a formulation XLA
cannot compile.  Here the arbitrary-ratio resampler is re-derived as a
*static* rational operation:

With input/output rates in the exact ratio ``p/q`` (reduced), the
reference's accumulator emits output ``k`` at input index
``n_k = ceil((k+1) p / q) - 1`` (downsampling) and scatters input ``n`` to
output base ``o_n = ceil(n q / p)`` (upsampling).  Both patterns are
periodic: advancing ``q`` outputs advances exactly ``p`` inputs.  Grouping
outputs by residue class mod ``q`` turns resampling into a single
cross-correlation with ``q`` output channels and stride ``p`` — a shape XLA
lowers onto the TPU MXU as an implicit GEMM:

    y[b, m*q + r] = sum_u  xp[b, s0 + m*p + u] * W[r, u]

where ``W`` is a host-designed kernel matrix embedding the windowed-sinc
taps at each residue's offset.  History (the ring buffer) becomes a carried
``hist`` slab concatenated in front of each chunk; output counts are static
because chunks are constrained to whole periods (``chunk_len % p == 0``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radiorust_tpu import config

from ..math import sinc
from ..windowing import Kaiser

__all__ = [
    "design_ir", "RationalPlan", "plan_downsample", "plan_upsample",
    "rational_fir",
]


def design_ir(base_rate: float, other_rate: float, margin: float,
              quality: float) -> np.ndarray:
    """Windowed-sinc prototype taps (float64).

    Mirrors the reference's IR design (``src/blocks/resampling.rs:82-101``
    and ``:216-233``): length ``ceil(base_rate/margin*quality)``, Kaiser
    window with first null at bin ``len*margin/base_rate``, taps
    ``sinc(x*other_rate/base_rate) * window``, energy-normalized.  For
    downsampling ``base=input, other=output``; for upsampling
    ``base=output, other=input``.
    """
    ir_len = int(math.ceil(base_rate / margin * quality))
    assert ir_len > 0
    window = Kaiser.with_null_at_bin(ir_len * margin / base_rate)
    x = (np.arange(ir_len, dtype=np.float64) + 0.5) - ir_len / 2.0
    y = sinc(x * other_rate / base_rate) * window.relative_value_at(
        x * 2.0 / ir_len)
    return y / np.sqrt(np.sum(y * y))


def _exact_ratio(input_rate: float, output_rate: float) -> Tuple[int, int]:
    """Reduced (p, q) with input_rate/output_rate == p/q exactly (as f64s)."""
    r = Fraction(input_rate) / Fraction(output_rate)
    return r.numerator, r.denominator


@dataclass(frozen=True)
class RationalPlan:
    """Static plan for one rational resampling op."""

    p: int            # input samples per period
    q: int            # output samples per period
    kernel: np.ndarray  # [q, Kw] float32 kernel matrix
    hist: int         # carried history samples (prepended to each chunk)
    s0: int           # start offset of window 0 in the padded input
    out_per_in: Fraction

    def out_len(self, chunk_len: int) -> int:
        if chunk_len % self.p:
            raise ValueError(
                f"chunk_len {chunk_len} must be a multiple of {self.p} "
                f"(rational resampling period); insert a Rechunker")
        return (chunk_len // self.p) * self.q


def plan_downsample(input_rate: float, output_rate: float, bandwidth: float,
                    quality: float = 3.0,
                    prefilter_ir=None) -> RationalPlan:
    """Plan a downsampling op (``src/blocks/resampling.rs:38-146``).

    ``prefilter_ir`` (optional, at the *input* rate) fuses a preceding LTI
    filter into the decimating FIR: the composite correlation taps are
    ``conv(ir, reversed(prefilter_ir))``, which computes exactly
    ``decimate(filter(x))`` in one strided convolution — used e.g. to fold
    the WFM deemphasis filter into the final decimation.
    """
    assert output_rate >= 0.0 and bandwidth >= 0.0
    assert bandwidth < output_rate, "bandwidth must be below output rate"
    assert input_rate >= output_rate, "input rate must be >= output rate"
    margin = (output_rate - bandwidth) / 2.0
    ir = design_ir(input_rate, output_rate, margin, quality)
    if prefilter_ir is not None:
        pre = np.asarray(prefilter_ir)
        if np.abs(pre.imag).max() > 1e-9 * max(np.abs(pre.real).max(), 1e-30):
            raise ValueError("prefilter impulse response must be real "
                             "(conjugate-symmetric frequency response)")
        ir = np.convolve(ir, pre.real[::-1])
    L = len(ir)
    p, q = _exact_ratio(input_rate, output_rate)
    # Output k lands on input index n_k = ceil((k+1) p / q) - 1; one period
    # of residues:
    n = [-((-(k + 1) * p) // q) - 1 for k in range(q)]
    Kw = L + p - 1
    W = np.zeros((q, Kw), dtype=np.float64)
    for r in range(q):
        W[r, n[r]: n[r] + L] = ir
    from ..numbers import stream_real
    return RationalPlan(p=p, q=q, kernel=W.astype(stream_real()),
                        hist=L - 1, s0=0,
                        out_per_in=Fraction(q, p))


def plan_upsample(input_rate: float, output_rate: float, bandwidth: float,
                  quality: float = 3.0) -> RationalPlan:
    """Plan an upsampling op (``src/blocks/resampling.rs:173-280``)."""
    assert output_rate >= 0.0 and bandwidth >= 0.0
    assert input_rate <= output_rate, "input rate must be <= output rate"
    assert bandwidth < input_rate, "bandwidth must be below input rate"
    margin = (input_rate - bandwidth) / 2.0
    ir = design_ir(output_rate, input_rate, margin, quality)
    L = len(ir)
    p, q = _exact_ratio(input_rate, output_rate)
    # Input n scatters ir into outputs o_n + j, o_n = ceil(n q / p); output m
    # sums x[n] * ir[m - o_n] over lo(m) <= n <= hi(m).
    def hi(m):
        return (m * p) // q

    def lo(m):
        return ((m - L) * p) // q + 1

    his = [hi(r) for r in range(q)]
    los = [lo(r) for r in range(q)]
    minlo = min(los)
    Kw = max(h - minlo + 1 for h in his)
    # Evaluate taps at a period far enough in that all indices are >= 0.
    C = max(0, -((minlo) // p) + 1)
    W = np.zeros((q, Kw), dtype=np.float64)
    for r in range(q):
        m = r + C * q
        base = minlo + C * p
        for u in range(Kw):
            n = base + u
            j = m - (-((-n * q) // p))  # m - ceil(n q / p)
            if los[r] + C * p <= n <= his[r] + C * p and 0 <= j < L:
                W[r, u] = ir[j]
    hist = max(0, -minlo)
    s0 = minlo + hist
    from ..numbers import stream_real
    return RationalPlan(p=p, q=q, kernel=W.astype(stream_real()),
                        hist=hist, s0=s0, out_per_in=Fraction(q, p))


def rational_fir(xp: jax.Array, kernel: jax.Array, p: int, q: int,
                 s0: int, out_len: int, real_input: bool = False) -> jax.Array:
    """Apply a rational-resampling kernel matrix.

    ``xp``: [batch, hist+chunk_len] complex64 (history prepended).
    ``kernel``: [q, Kw] float32.  Returns [batch, out_len] complex64.

    Real/imaginary parts ride the conv batch axis so one real conv call
    serves the complex stream; XLA lowers the strided multi-channel
    correlation onto the MXU.  ``real_input=True`` (stream known to carry
    zero imaginary part) halves the conv work.
    """
    b = xp.shape[0]
    # f64 stream mode (complex128 inputs, CPU backend): the conv runs in
    # f64 end to end; otherwise f32 as before.
    rdt = jnp.float64 if xp.dtype == jnp.complex128 else jnp.float32
    if real_input:
        lhs = xp.real[:, None, :]
        if s0:
            lhs = lhs[:, :, s0:]
        out = jax.lax.conv_general_dilated(
            lhs.astype(rdt), kernel[:, None, :].astype(rdt),
            window_strides=(p,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=rdt,
            precision=config.matmul_precision(),
        )
        m = out_len // q
        yr = jnp.swapaxes(out[:, :, :m], 1, 2).reshape(b, out_len)
        return jax.lax.complex(yr, jnp.zeros_like(yr))
    lhs = jnp.concatenate([xp.real, xp.imag], axis=0)[:, None, :]
    if s0:
        lhs = lhs[:, :, s0:]
    rhs = kernel[:, None, :]
    out = jax.lax.conv_general_dilated(
        lhs.astype(rdt), rhs.astype(rdt),
        window_strides=(p,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=rdt,
        precision=config.matmul_precision(),  # f32-accurate on the MXU
    )  # [2b, q, M']
    m = out_len // q
    out = out[:, :, :m]
    y = jax.lax.complex(out[:b], out[b:])            # [b, q, M]
    y = jnp.swapaxes(y, 1, 2).reshape(b, out_len)    # interleave residues
    return y
