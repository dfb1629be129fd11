"""Fused overlap-save filter as a single Pallas TPU kernel.

The unfused filter (matmul FFT -> response multiply -> matmul IFFT,
``ops/fft.py``) round-trips HBM ~10 times per chunk for intermediates and
is bandwidth-bound.  This kernel keeps the whole pipeline in VMEM: per
stream-tile it

1. assembles the overlap-save buffer [prev || cur] as an [n1, n2] grid,
2. runs the four-step DFT as two MXU matmuls + twiddle,
3. multiplies by the (grid-layout) frequency response,
4. runs the inverse transform with conjugated factors — contracting only
   the output rows that map to the first ``n`` time samples, halving the
   final matmul,

reading 2n complex samples per stream and writing n, with zero HBM
intermediates.  All data is float32 planes (the backend cannot marshal
complex64); the DFT factor matrices, twiddles, and response ride along as
kernel inputs so a response retune needs no recompilation.

Layout notes: time index n = i2 + n2*i1 (so the first n samples are rows
i1 < n1/2 — contiguous), frequency index k = k1 + n1*k2 (grid [k1, k2]);
the response vector R[2n] maps to the grid as ``R.reshape(n2, n1).T``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiorust_tpu import config

__all__ = ["fused_overlap_save", "fused_filter_bank",
           "fused_demod_filter",
           "fused_filter_demod_filter", "response_to_grid", "response_grid",
           "supported", "bank_supported", "use_fused_filter"]


def _make_cmm(mm):
    """Complex matmul (ar+i·ai)(br+i·bi) -> (re, im) on top of a real
    matmul ``mm``.  The 3-multiplication Gauss form saves 25% MXU FLOPs
    (config.complex_mm_3mul); conjugation is a negated ``bi`` at the call
    site."""
    if config.complex_mm_3mul():
        def cmm(ar, ai, br, bi):
            m1 = mm(ar, br)
            m2 = mm(ai, bi)
            m3 = mm(ar + ai, br + bi)
            return m1 - m2, m3 - m1 - m2
    else:
        def cmm(ar, ai, br, bi):
            return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)
    return cmm


from .mxu import pallas_call as _pallas_call  # off-TPU interpret policy


def kernel_factors(n2x: int):
    """Factor 2n = n1 * n2 for the four-step transform.  Default n2 = 128:
    the lane dimension matches the VPU/MXU tile so every matmul and
    elementwise stage is tile-aligned.  ``RRTPU_FILTER_FACTORS=N1xN2``
    overrides the split for A/B experiments (e.g. ``128x96`` — the
    VERDICT-r3 untried ordering; sub-128 lanes pad every stage, measured
    slower, see docs/PERF.md)."""
    import os
    override = os.environ.get("RRTPU_FILTER_FACTORS")
    if override:
        try:
            n1, n2 = (int(v) for v in override.lower().split("x"))
        except ValueError:
            raise ValueError(
                f"RRTPU_FILTER_FACTORS={override!r}: expected 'N1xN2' "
                f"(two integers, e.g. 128x96)") from None
        # n1 % 8: the pipeline reshapes/concats slice the transform rows
        # at sublane granularity — the same alignment the default path
        # guarantees; an odd-but-even n1 (e.g. 6x2048) would be accepted
        # here only to fail Mosaic lowering deep inside compilation.
        if n1 * n2 == n2x and n1 % 8 == 0:
            return n1, n2
        # Override doesn't apply to this transform size: fall through.
    if n2x % 128:
        return None
    n1 = n2x // 128
    if n1 % 8:
        return None
    return n1, 128


def supported(n: int, m: int = None) -> bool:
    """Whether the fused kernel can run a chunk of ``n`` new samples with
    an ``m``-tap overlap-save history (``m = n`` — the reference's coupled
    geometry — when omitted).  Needs the ``n + m``-point transform to
    factor for the four-step pipeline and the history to land on whole
    grid rows (``m`` divisible by the lane factor ``n2``)."""
    if m is None:
        m = n
    f = kernel_factors(n + m)
    if f is None:
        return False
    n1, n2 = f
    return m % n2 == 0 and 0 < m < n + m


_BANK_VMEM_BUDGET = 8 * 1024 * 1024  # bytes for the K-scaling live set


def _bank_live_bytes(tile: int, K: int, n: int) -> int:
    # 2tKn outputs + 4tKn stacked response-multiplied grids (the K-band
    # multiply writes the stacked layout directly — one broadcast pass,
    # no per-band concat transient).
    return (2 * tile * K * n + 4 * tile * K * n) * 4


def bank_tile(n: int, K: int, tile: int = None) -> int:
    """Largest SUBLANE-LEGAL stream tile whose K-band live set fits the
    VMEM budget; 0 when none does.  Mosaic requires the stream block's
    leading dim to be a multiple of 8 (or equal to the full batch — the
    small-batch case handled by :func:`_resolve_bank_tile`), so the
    search walks multiples of 8 down to 8: an n=9216, K=3 bank fits at
    tile 8; banks too large even there fall back to the XLA
    shared-forward formulation (a tile-4 block was measured
    UNLOWERABLE, r5 config sweep)."""
    t0 = tile if tile is not None else config.pallas_tile()
    for t in range(max(8, (t0 // 8) * 8), 7, -8):
        if _bank_live_bytes(t, K, n) <= _BANK_VMEM_BUDGET:
            return t
    return 0


def _resolve_bank_tile(n: int, K: int, tile, b: int) -> int:
    """The tile the bank kernel will actually run at for batch ``b``
    (0 = does not fit): the budgeted sublane-legal tile, clamped to the
    batch; a non-dividing batch forces the array-dim-equal full-batch
    block, which must ALSO fit the budget (a remainder tile would be
    unlowerable)."""
    t = bank_tile(n, K, tile)
    if t < 1:
        return 0
    t = min(t, b)
    if b % t:
        t = b
    return t if _bank_live_bytes(t, K, n) <= _BANK_VMEM_BUDGET else 0


def bank_supported(n: int, K: int, tile: int = None,
                   m: int = None, batch: int = None) -> bool:
    """Whether a K-band bank fits the fused kernel: transform-size
    support plus a VMEM budget on the K-scaling live set per grid step —
    the 2 x [tile, K, n] output blocks plus the stacked
    response-multiplied grids (4*tile*K*n words, the dominant term)
    that feed the width-K*tile inverse.  ~8 MB is left for inputs,
    constants, the forward grid, and inverse transients; the tile steps
    down in sublane-legal multiples of 8 until the set fits
    (:func:`bank_tile`).  ``batch`` (when known) accounts the
    full-batch block a non-dividing batch forces.  Banks too large at
    any legal tile fall back to the XLA shared-forward formulation
    instead of failing Mosaic compilation — the same failure class
    decimate_supported's weight-slab budget guards (a real 25 MB OOM,
    VALIDATE_r04 notes)."""
    if not supported(n, m):
        return False
    if batch is None:
        return bank_tile(n, K, tile) >= 1
    return _resolve_bank_tile(n, K, tile, batch) >= 1


def use_fused_filter(chunk_len: int, ir_len: int = None) -> bool:
    """Shared backend gate for the fused VMEM filter kernels: the
    (chunk, history) geometry must factor for the four-step transform and
    the backend must be a real TPU — on CPU (which includes every
    c128/f64-stream-mode run: that mode is CPU-only by policy,
    numbers.py) the XLA formulations run instead.  Single owner —
    _BoundFilter, _BoundFilterBank, and any future fused-filter call
    site must use this, not a private copy."""
    import jax as _jax
    return (supported(chunk_len, ir_len)
            and _jax.default_backend() not in ("cpu",))


@functools.lru_cache(maxsize=32)
def _factor_constants(n2x: int, n1: int, n2: int,
                      ho: int) -> Tuple[np.ndarray, ...]:
    k1 = np.arange(n1)
    d1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)       # [k1, i1]
    k2 = np.arange(n2)
    d2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)       # [i2, k2]
    tw = np.exp(-2j * np.pi * np.outer(k1, np.arange(n2)) / n2x)
    # Inverse factors (conjugates); stage-1 inverse only needs output rows
    # i1 < ho (the first X = ho*n2 time samples — ho = n1//2 in the
    # coupled geometry, n1 - m/n2 when the history is shorter).
    e1 = np.conj(d1)[:, :ho]                                # [k1, i1<ho]
    f32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return (*f32(d1), *f32(d2), *f32(tw), *f32(e1))


def response_to_grid(response: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Map R[2n] (complex) to grid planes [n1, n2] with the IFFT's 1/(2n)
    normalization folded in."""
    n2x = len(response)
    n1, n2 = kernel_factors(n2x)
    rg = np.asarray(response, np.complex128).reshape(n2, n1).T / n2x
    return rg.real.astype(np.float32), rg.imag.astype(np.float32)


def response_grid(response, n: int = None):
    """Traced variant of :func:`response_to_grid`: maps a (possibly
    traced, retunable) complex R[N] param to the [n1, n2] kernel grid
    with the 1/N IFFT norm folded in (N = len(response) = chunk + history
    — 2n in the coupled geometry).  The single owner of the layout
    contract between the response vector and ``kernel_factors`` — every
    fused-kernel call site must use it (including under a
    ``RRTPU_FILTER_FACTORS`` override, where n2 != 128).  ``n`` is
    accepted for backward compatibility and ignored: the transform size
    is the response's own length."""
    N = response.shape[-1]
    n1, n2 = kernel_factors(N)
    return jnp.swapaxes(response.reshape(n2, n1), 0, 1) / float(N)


@functools.lru_cache(maxsize=32)
def _block_constants(n2x: int, n1: int, n2: int, mode: str,
                     ho: int) -> Tuple[np.ndarray, ...]:
    """Block-form DFT constants: each complex factor C becomes ONE real
    matrix with the [[Cr,-Ci],[Ci,Cr]] (left operand) or [[Cr,Ci],[-Ci,Cr]]
    (right operand) structure, so a complex matmul is a single real dot of
    doubled contraction depth.  In ``high`` mode the constants ship as
    precomputed bf16 hi/lo splits (the in-kernel split of a constant is
    wasted VPU work); otherwise as f32."""
    k1 = np.arange(n1)
    d1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    k2 = np.arange(n2)
    d2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(k1, np.arange(n2)) / n2x)
    e1t = np.conj(d1)[:, :ho].T                        # [ho, k1]

    def left(c):                                       # y = C @ z
        return np.block([[c.real, -c.imag], [c.imag, c.real]])

    def right(c):                                      # y = z @ C
        return np.block([[c.real, c.imag], [-c.imag, c.real]])

    blocks = (left(d1), right(d2), right(np.conj(d2)), left(e1t))
    out = []
    for m in blocks:
        m = m.astype(np.float32)
        if mode == "high":
            hi = m.astype(jnp.bfloat16)
            lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            out += [np.asarray(hi), np.asarray(lo)]
        else:
            out.append(m)
    out += [tw.real.astype(np.float32), tw.imag.astype(np.float32)]
    return tuple(out)


def _grid_mul(vr, vi, rr, ri):
    """Frequency-response multiply on the [n1, X, n2] grid (grid-layout
    response planes [n1, n2], 1/(2n) folded in)."""
    gr = rr[:, None, :]
    gi = ri[:, None, :]
    return vr * gr - vi * gi, vr * gi + vi * gr


def _os_pipeline_block(n1, n2, X, mode, ho=None):
    """Block-matrix variant of :func:`_os_pipeline`: each DFT stage is ONE
    real dot on re/im-concatenated operands (stage 1/inverse-1 concatenate
    planes along the contraction sublanes, stage 2/inverse-2 along lanes).
    Same FLOPs as the 4-mult complex form, 1/4 the MXU dispatches, deeper
    accumulation (K = 2*n1 or 2*n2), and no f32 cross-term adds.

    ``ho``: output rows of the inverse truncation (n1//2 in the coupled
    geometry; n1 - m/n2 when the overlap history m is decoupled from the
    chunk length)."""
    from .mxu import _split_bf16
    if ho is None:
        ho = n1 // 2
    n = ho * n2
    base = functools.partial(jax.lax.dot_general,
                             preferred_element_type=jnp.float32,
                             precision=(jax.lax.Precision.DEFAULT
                                        if mode == "high" else
                                        jax.lax.Precision.HIGHEST
                                        if mode == "highest" else
                                        jax.lax.Precision.DEFAULT))
    dn = (((1,), (0,)), ((), ()))

    if mode == "high":
        def bdot_left(c, z):                    # (chi, clo) @ z
            chi, clo = c
            zhi, zlo = _split_bf16(z)
            return (base(chi, zhi, dn)
                    + (base(chi, zlo, dn) + base(clo, zhi, dn)))

        def bdot_right(z, c):                   # z @ (chi, clo)
            chi, clo = c
            zhi, zlo = _split_bf16(z)
            return (base(zhi, chi, dn)
                    + (base(zlo, chi, dn) + base(zhi, clo, dn)))

        def unpack(consts):
            (l1h, l1l, r2h, r2l, rch, rcl, e1h, e1l, twr, twi) = consts
            return ((l1h, l1l), (r2h, r2l), (rch, rcl), (e1h, e1l),
                    twr, twi)
    else:
        def bdot_left(c, z):
            return base(c, z, dn)

        def bdot_right(z, c):
            return base(z, c, dn)

        def unpack(consts):
            l1, r2, rc, e1, twr, twi = consts
            return l1, r2, rc, e1, twr, twi

    import os
    s1_rows = os.environ.get("RRTPU_FILTER_S1") == "rows"

    def forward(zr, zi, *consts):
        """Forward four-step DFT: [X, n1, n2] planes -> grid [n1, X, n2]."""
        l1, r2, rc, e1, twr, twi = unpack(consts)
        if s1_rows:
            # Experimental orientation (VERDICT r3 item 3 lever b): put
            # the streams on the matmul M dim — [X*n2, 2n1] @ [2n1, 2n1]
            # with M = X*128 full tiles — instead of M = 2n1.  MXU tile
            # padding is identical either way (the 1.5-tile dim just
            # moves from M to N), so any difference is scheduling.
            zt = jnp.concatenate(
                [jnp.swapaxes(zr, 1, 2).reshape(X * n2, n1),
                 jnp.swapaxes(zi, 1, 2).reshape(X * n2, n1)], axis=1)
            lt = (tuple(jnp.swapaxes(c, 0, 1) for c in l1)
                  if isinstance(l1, tuple) else jnp.swapaxes(l1, 0, 1))
            # (C @ Z)^T = Z^T @ C^T with the [[Cr,-Ci],[Ci,Cr]] block
            # structure transposing to the right-operand form.
            tt = bdot_right(zt, lt)
            tr = jnp.swapaxes(tt[:, :n1].reshape(X, n2, n1), 1, 2) \
                .swapaxes(0, 1)
            ti = jnp.swapaxes(tt[:, n1:].reshape(X, n2, n1), 1, 2) \
                .swapaxes(0, 1)
        else:
            # Stage 1: one dot over the re/im-stacked sublanes
            # [2n1, X*n2].
            zr2 = jnp.swapaxes(zr, 0, 1).reshape(n1, X * n2)
            zi2 = jnp.swapaxes(zi, 0, 1).reshape(n1, X * n2)
            t = bdot_left(l1, jnp.concatenate([zr2, zi2], axis=0))
            tr = t[:n1].reshape(n1, X, n2)
            ti = t[n1:].reshape(n1, X, n2)
        wr = twr[:, None, :]
        wi = twi[:, None, :]
        ur = tr * wr - ti * wi
        ui = tr * wi + ti * wr
        # Stage 2: one dot over re/im-stacked lanes [n1*X, 2*n2].
        u = jnp.concatenate([ur.reshape(n1 * X, n2),
                             ui.reshape(n1 * X, n2)], axis=1)
        v = bdot_right(u, r2)
        vr = v[:, :n2].reshape(n1, X, n2)
        vi = v[:, n2:].reshape(n1, X, n2)
        return vr, vi

    def inverse(pr, pi, *consts):
        """Inverse transform of a response-multiplied grid, truncated to
        the first n time samples: [n1, X, n2] -> [X, n] planes."""
        l1, r2, rc, e1, twr, twi = unpack(consts)
        wr = twr[:, None, :]
        wi = twi[:, None, :]
        # Inverse stage 2 (conjugated factor).
        p = jnp.concatenate([pr.reshape(n1 * X, n2),
                             pi.reshape(n1 * X, n2)], axis=1)
        q = bdot_right(p, rc)
        qr = q[:, :n2].reshape(n1, X, n2)
        qi = q[:, n2:].reshape(n1, X, n2)
        sr = qr * wr + qi * wi
        si = qi * wr - qr * wi
        # Inverse stage 1, truncated to the first n samples.
        s = jnp.concatenate([sr.reshape(n1, X * n2),
                             si.reshape(n1, X * n2)], axis=0)
        y = bdot_left(e1, s)
        yr = jnp.swapaxes(y[:ho].reshape(ho, X, n2), 0, 1).reshape(X, n)
        yi = jnp.swapaxes(y[ho:].reshape(ho, X, n2), 0, 1).reshape(X, n)
        return yr, yi

    def pipeline(zr, zi, rr, ri, *consts):
        vr, vi = forward(zr, zi, *consts)
        pr, pi = _grid_mul(vr, vi, rr, ri)
        return inverse(pr, pi, *consts)

    return forward, inverse, pipeline


class _TransformPlan:
    """Owns the choice between the classic complex-matmul pipeline and the
    block-matrix pipeline (config.filter_blockmm): the constant arrays fed
    to the kernel and the matching pipeline builder.

    ``prev_rows``: grid rows holding the overlap-save history (m / n2).
    Defaults to n1//2 — the reference's coupled geometry where history =
    chunk = half the transform.  A smaller value decouples the filter's
    IR length from the samples-per-step (same designed response, more new
    samples per transform — the tile-friendly 128x128 geometry)."""

    def __init__(self, n2x: int, precision=None, prev_rows: int = None):
        from .mxu import resolve_mode
        self.n1, self.n2 = kernel_factors(n2x)
        self.hp = self.n1 // 2 if prev_rows is None else prev_rows
        if not 0 < self.hp < self.n1:
            raise ValueError(f"prev_rows {self.hp} outside (0, {self.n1})")
        self.ho = self.n1 - self.hp
        self.mode = resolve_mode(precision)
        self.block = config.filter_blockmm()
        self.precision = precision
        if self.block:
            self.consts = _block_constants(n2x, self.n1, self.n2, self.mode,
                                           self.ho)
        else:
            self.consts = _factor_constants(n2x, self.n1, self.n2, self.ho)

    def const_arrays(self):
        return [jnp.asarray(c) for c in self.consts]

    def _parts(self, X: int):
        if self.block:
            return _os_pipeline_block(self.n1, self.n2, X, self.mode,
                                      self.ho)
        from .mxu import make_dot
        dot = make_dot(self.precision)

        def mm(a, b):
            return dot(a, b, (((1,), (0,)), ((), ())))

        return _os_pipeline(_make_cmm(mm), self.n1, self.n2, X, self.ho)

    def pipeline(self, X: int):
        """forward -> response multiply -> inverse, fused."""
        return self._parts(X)[2]

    def pipeline_parts(self, X: int):
        """(forward, inverse) halves — for kernels that share ONE forward
        transform across several responses (the filter bank)."""
        fwd, inv, _ = self._parts(X)
        return fwd, inv


def _os_pipeline(cmm, n1, n2, X, ho=None):
    """The overlap-save transform pipeline on X packed streams: forward
    four-step DFT -> response multiply -> inverse with the stage-1
    contraction truncated to the first ``ho * n2`` output samples
    (``ho`` = n1//2 in the coupled geometry).  Operates on [X, n1, n2]
    grids; returns [X, n] planes.  Shared by the filter, the
    demod+filter, and the merged filter+demod+filter kernels."""
    if ho is None:
        ho = n1 // 2
    n = ho * n2

    def forward(zr, zi, d1r, d1i, d2r, d2i, twr, twi, e1r, e1i):
        """Forward four-step DFT: [X, n1, n2] planes -> grid [n1, X, n2]."""
        # Stage 1: contract i1 with D1 -> [k1, X, i2] via [n1, X*n2] matmul.
        zr2 = jnp.swapaxes(zr, 0, 1).reshape(n1, X * n2)
        zi2 = jnp.swapaxes(zi, 0, 1).reshape(n1, X * n2)
        tr, ti = cmm(d1r, d1i, zr2, zi2)
        # Twiddle (broadcast over streams): reshape to [k1, X, n2].
        tr = tr.reshape(n1, X, n2)
        ti = ti.reshape(n1, X, n2)
        wr = twr[:, None, :]
        wi = twi[:, None, :]
        ur = tr * wr - ti * wi
        ui = tr * wi + ti * wr
        # Stage 2: contract i2 with D2 -> grid [k1, X, k2].
        ur2 = ur.reshape(n1 * X, n2)
        ui2 = ui.reshape(n1 * X, n2)
        vr, vi = cmm(ur2, ui2, d2r, d2i)
        return vr.reshape(n1, X, n2), vi.reshape(n1, X, n2)

    def inverse(pr, pi, d1r, d1i, d2r, d2i, twr, twi, e1r, e1i):
        """Inverse transform of a response-multiplied grid, truncated to
        the first n time samples: [n1, X, n2] -> [X, n] planes."""
        wr = twr[:, None, :]
        wi = twi[:, None, :]
        # Inverse stage 2: contract k2 with conj(D2) (= D2^H since D2 is
        # symmetric: conj + transpose == conj).
        pr2 = pr.reshape(n1 * X, n2)
        pi2 = pi.reshape(n1 * X, n2)
        qr, qi = cmm(pr2, pi2, d2r, -d2i)            # (pr+i·pi)·conj(d2)
        # Inverse twiddle (conjugate).
        qr = qr.reshape(n1, X, n2)
        qi = qi.reshape(n1, X, n2)
        sr = qr * wr + qi * wi
        si = qi * wr - qr * wi
        # Inverse stage 1, truncated to the first n samples (i1 < ho):
        # x[i1, X, i2] = sum_k1 conj(D1)[k1, i1] * S[k1, X, i2].
        sr2 = sr.reshape(n1, X * n2)
        si2 = si.reshape(n1, X * n2)
        e1rt = jnp.swapaxes(e1r, 0, 1)               # [ho, k1]
        e1it = jnp.swapaxes(e1i, 0, 1)
        yr, yi = cmm(e1rt, e1it, sr2, si2)
        yr = jnp.swapaxes(yr.reshape(ho, X, n2), 0, 1).reshape(X, n)
        yi = jnp.swapaxes(yi.reshape(ho, X, n2), 0, 1).reshape(X, n)
        return yr, yi

    def pipeline(zr, zi, rr, ri, *consts):
        vr, vi = forward(zr, zi, *consts)
        pr, pi = _grid_mul(vr, vi, rr, ri)
        return inverse(pr, pi, *consts)

    return forward, inverse, pipeline


def _make_kernel(plan: "_TransformPlan", tile: int):
    n1, n2 = plan.n1, plan.n2
    hp, ho = plan.hp, plan.ho
    pipe = plan.pipeline(tile)
    nc = len(plan.consts)

    def kernel(*refs):
        prevr, previ, curr, curi, rr, ri = refs[:6]
        consts = refs[6:6 + nc]
        outr, outi = refs[6 + nc:]
        s = tile
        # Assemble [s, n1, n2] grid: hp history rows then ho cur rows.
        xr = jnp.concatenate(
            [prevr[:].reshape(s, hp, n2), curr[:].reshape(s, ho, n2)],
            axis=1)
        xi = jnp.concatenate(
            [previ[:].reshape(s, hp, n2), curi[:].reshape(s, ho, n2)],
            axis=1)
        yr, yi = pipe(xr, xi, rr[:], ri[:], *[c[:] for c in consts])
        outr[:] = yr
        outi[:] = yi

    return kernel


def _filter_plan(m: int, n: int, precision):
    """Transform plan for an m-tap history and n new samples per step
    (N = m + n point transform); validates the row alignment."""
    _, n2 = kernel_factors(m + n)
    if m % n2:
        raise ValueError(
            f"history {m} not divisible by lane factor {n2}")
    return _TransformPlan(m + n, precision, prev_rows=m // n2)


def fused_overlap_save(prevr, previ, curr, curi, resp_gr, resp_gi,
                       tile: int = None, precision=None):
    """Filter one chunk step for all streams.

    Inputs: float32 planes [batch, m] (overlap-save history — ``m = n``
    in the reference's coupled geometry, shorter when the IR length is
    decoupled) and [batch, n] (current chunk), plus the response grid
    planes [n1, n2] from :func:`response_to_grid` of the length-(m+n)
    extended response.  Returns (outr, outi) float32 [batch, n].
    """
    b, n = curr.shape
    m = prevr.shape[1]
    if tile is None:
        tile = config.pallas_tile()
    tile = min(tile, b)
    if b % tile:
        tile = 1
    plan = _filter_plan(m, n, precision)
    const_arrays = plan.const_arrays()
    kernel = _make_kernel(plan, tile)
    grid = (b // tile,)
    stream_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec((tile, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outr, outi = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[prev_spec] * 2 + [stream_spec] * 2
                 + [const_spec] * (2 + len(const_arrays)),
        out_specs=[stream_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2,
    )(prevr, previ, curr, curi, resp_gr, resp_gi, *const_arrays)
    return outr, outi


# ---------------------------------------------------------------------------
# Fused filter BANK: one forward transform, K response multiplies + inverses
# ---------------------------------------------------------------------------

def _make_bank_kernel(plan: "_TransformPlan", tile: int, K: int):
    n1, n2 = plan.n1, plan.n2
    hp, ho = plan.hp, plan.ho
    n = ho * n2
    fwd, _ = plan.pipeline_parts(tile)
    # The transform pipeline is agnostic to the stream-axis width, so the
    # K response-multiplied grids stack along it (axis 1: stream index
    # k*tile + x) and ONE inverse of width K*tile serves every band —
    # 2 inverse dots total instead of 2 per band, with K-times-deeper
    # matmul M dims.  Row-stacking is bit-identical to per-band inverses.
    _, inv_many = plan.pipeline_parts(K * tile)
    nc = len(plan.consts)

    def kernel(*refs):
        prevr, previ, curr, curi, rr, ri = refs[:6]   # rr/ri: [K, n1, n2]
        consts = tuple(c[:] for c in refs[6:6 + nc])
        outr, outi = refs[6 + nc:]                    # [tile, K, n]
        xr = jnp.concatenate(
            [prevr[:].reshape(tile, hp, n2),
             curr[:].reshape(tile, ho, n2)], axis=1)
        xi = jnp.concatenate(
            [previ[:].reshape(tile, hp, n2),
             curi[:].reshape(tile, ho, n2)], axis=1)
        vr, vi = fwd(xr, xi, *consts)                 # ONE forward
        # All K response multiplies as ONE broadcast elementwise pass
        # into the stacked [n1, K*tile, n2] layout (band k = rows
        # k*tile..(k+1)*tile, identical to the per-band concat this
        # replaces — which transiently DOUBLED the dominant VMEM term).
        vr4 = vr[:, None, :, :]                       # [n1, 1, tile, n2]
        vi4 = vi[:, None, :, :]
        gr4 = jnp.swapaxes(rr[:], 0, 1)[:, :, None, :]  # [n1, K, 1, n2]
        gi4 = jnp.swapaxes(ri[:], 0, 1)[:, :, None, :]
        pr = (vr4 * gr4 - vi4 * gi4).reshape(n1, K * tile, n2)
        pi = (vr4 * gi4 + vi4 * gr4).reshape(n1, K * tile, n2)
        yr, yi = inv_many(pr, pi, *consts)
        y3r = yr.reshape(K, tile, n)
        y3i = yi.reshape(K, tile, n)
        for k in range(K):
            outr[:, k, :] = y3r[k]
            outi[:, k, :] = y3i[k]

    return kernel


def fused_filter_bank(prevr, previ, curr, curi, resp_gr, resp_gi,
                      tile: int = None, precision=None):
    """K overlap-save filters over one stream in ONE kernel: the forward
    four-step transform runs once per stream tile and stays in VMEM while
    the K response multiplies + inverse transforms consume it — vs the
    XLA shared-forward bank, which round-trips every [tile, 2n] grid
    through HBM between the forward, multiply, and inverse stages.

    ``resp_gr/gi``: [K, n1, n2] stacked response grids
    (:func:`response_grid` per band).  Returns (outr, outi) float32
    [batch, K, n] — band k of stream b at ``out[b, k]``.
    """
    b, n = curr.shape
    m = prevr.shape[1]
    K = resp_gr.shape[0]
    tile = _resolve_bank_tile(n, K, tile, b)
    if tile < 1:
        # Callers are expected to pre-gate with bank_supported(batch=b);
        # building the kernel anyway would hit the Mosaic VMEM OOM the
        # budget exists to prevent.
        raise ValueError(
            f"filter bank K={K}, n={n}, batch={b} exceeds the VMEM "
            "budget at any lowerable tile; use the XLA shared-forward "
            "formulation (bank_supported gates this)")
    plan = _filter_plan(m, n, precision)
    const_arrays = plan.const_arrays()
    kernel = _make_bank_kernel(plan, tile, K)
    grid = (b // tile,)
    stream_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec((tile, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((tile, K, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outr, outi = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[prev_spec] * 2 + [stream_spec] * 2
                 + [const_spec] * (2 + len(const_arrays)),
        out_specs=[out3] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, K, n), jnp.float32)] * 2,
    )(prevr, previ, curr, curi, resp_gr, resp_gi, *const_arrays)
    return outr, outi


# ---------------------------------------------------------------------------
# Fused FM-demod + overlap-save filter (real-paired)
# ---------------------------------------------------------------------------

def _atan2_poly(b, a):
    """Vectorized atan2 via Cephes-style polynomial atan (Pallas TPU has no
    atan2 primitive).  Max error ~1.2e-7 rad — the same class as f32 libm,
    inside the framework's f32 SNR bound."""
    abs_a = jnp.abs(a)
    abs_b = jnp.abs(b)
    big = jnp.maximum(abs_a, abs_b)
    small = jnp.minimum(abs_a, abs_b)
    t = small / jnp.where(big == 0.0, 1.0, big)
    # Cephes atanf range reduction on [0, 1]: fold [tan(pi/8), 1] once.
    fold = t > 0.4142135623730950
    t2 = jnp.where(fold, (t - 1.0) / (t + 1.0), t)
    z = t2 * t2
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * t2 + t2
    r = jnp.where(fold, poly + jnp.float32(0.7853981633974483), poly)
    # Undo the min/max swap: angle from the x-axis.
    r = jnp.where(abs_b > abs_a, jnp.float32(1.5707963267948966) - r, r)
    # Quadrants.
    r = jnp.where(a < 0.0, jnp.float32(3.141592653589793) - r, r)
    r = jnp.where(b < 0.0, -r, r)
    return jnp.where(big == 0.0, jnp.zeros_like(r), r)


def _make_demod(rows: int, n: int):
    """Quadrature FM demodulation on [rows, n] value planes
    (src/blocks/modulation.rs:116-126).  ``plr/pli``: last sample of the
    previous chunk per stream ([rows, 1]); ``lastout``/``havep``: demod
    continuity state; ``fac``: per-stream demod factor (rides as a traced
    input so a set_deviation retune swaps a value instead of recompiling,
    src/blocks/modulation.rs:154-157)."""
    def demod(xr, xi, plr, pli, lastout, havep, fac):
        sr = pltpu.roll(xr, 1, 1)
        si = pltpu.roll(xi, 1, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
        first = col == 0
        sr = jnp.where(first, plr, sr)
        si = jnp.where(first, pli, si)
        pre = xr * sr + xi * si          # Re[x * conj(shifted)]
        pim = xi * sr - xr * si          # Im[x * conj(shifted)]
        d = _atan2_poly(pim, pre) * fac
        return jnp.where(first & (havep < 0.5), lastout, d)

    return demod


def _make_pair_filter(pipe, pair: int, n1: int, n2: int, hp: int = None):
    """Overlap-save on [prev_d || d] real planes with stream *pairs* packed
    into single complex transforms (exact for real impulse responses).
    ``prevd`` holds m = hp*n2 history samples (m = n in the coupled
    geometry).  Returns a stacked [pair, 2, n] plane (real part = even
    streams, imag = odd; the stack keeps the lane dim)."""
    if hp is None:
        hp = n1 // 2
    N = n1 * n2

    def pair_filter(prevd, d, rr, ri, consts):
        buf = jnp.concatenate([prevd, d], axis=-1)          # [tile, N]
        v = buf.reshape(pair, 2, N)
        zr = v[:, 0, :].reshape(pair, n1, n2)
        zi = v[:, 1, :].reshape(pair, n1, n2)
        yr, yi = pipe(zr, zi, rr, ri, *consts)
        return jnp.stack([yr, yi], axis=1)                  # [pair, 2, n]

    return pair_filter


def _make_demod_filter_kernel(plan: "_TransformPlan", tile: int):
    """Kernel: quadrature-demodulate the chunk, then run the overlap-save
    filter on the (real) demodulated stream with stream *pairs* packed into
    single complex transforms (exact for real impulse responses).

    ``tile`` must be even; the DFT stages run at tile/2 packed streams.
    """
    n1, n2 = plan.n1, plan.n2
    n = plan.ho * n2
    pair = tile // 2
    pipe = plan.pipeline(pair)
    nc = len(plan.consts)
    demod = _make_demod(tile, n)
    pair_filter = _make_pair_filter(pipe, pair, n1, n2, plan.hp)

    def kernel(*refs):
        (curr, curi, plr, pli, prevd, lastout, havep, fac,
         rr, ri) = refs[:10]
        consts = refs[10:10 + nc]
        out, dout = refs[10 + nc:]
        d = demod(curr[:], curi[:], plr[:], pli[:], lastout[:], havep[:],
                  fac[:])
        dout[:] = d
        out[:] = pair_filter(prevd[:], d, rr[:], ri[:],
                             tuple(c[:] for c in consts))

    return kernel


def fused_demod_filter(curr, curi, prev_last_r, prev_last_i, prevd,
                       last_out, have_prev, resp_gr, resp_gi,
                       factor: float, tile: int = None, precision=None):
    """FM demod + overlap-save filter in one kernel.

    ``curr/curi``: [batch, n] pre-demod planes; ``prev_last_*``: [batch]
    last sample of the previous pre-demod chunk; ``prevd``: [batch, m]
    previous demodulated history (m = n in the coupled geometry, the IR
    length when decoupled); ``last_out``/``have_prev``: [batch] demod
    continuity state (have_prev as 0/1 float); ``resp_gr/gi``: response
    grid planes from :func:`response_to_grid` (real impulse response
    required).  ``factor`` = sample_rate / deviation / 2pi — a Python
    float or a traced scalar/[batch] array (retunable without recompile).

    Returns (y [batch, n] f32 demod-filtered output, d [batch, n] f32
    demodulated chunk for the next step's state).  Batch must be even.
    """
    b, n = curr.shape
    m = prevd.shape[1]
    if tile is None:
        tile = 2 * config.pallas_tile()   # pair-packed: tile counts streams
    tile = min(tile, b)
    if b % tile or tile % 2:
        tile = 2
    assert b % tile == 0
    plan = _filter_plan(m, n, precision)
    const_arrays = plan.const_arrays()
    kernel = _make_demod_filter_kernel(plan, tile)
    fac = jnp.broadcast_to(jnp.asarray(factor, jnp.float32), (b,))
    grid = (b // tile,)
    row = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    col = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pair = tile // 2
    out3 = pl.BlockSpec((pair, 2, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out, dout = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(n), row(n), col, col, row(m), col, col, col]
                 + [const_spec] * (2 + len(const_arrays)),
        out_specs=[out3, row(n)],
        out_shape=[jax.ShapeDtypeStruct((b // 2, 2, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, n), jnp.float32)],
    )(curr, curi, prev_last_r[:, None], prev_last_i[:, None], prevd,
      last_out[:, None], have_prev[:, None], fac[:, None], resp_gr, resp_gi,
      *const_arrays)
    return out.reshape(b, n), dout


# ---------------------------------------------------------------------------
# Fully-merged mid-chain kernel: filter -> FM demod -> filter
# ---------------------------------------------------------------------------

def _make_filter_demod_filter_kernel(plan: "_TransformPlan", tile: int):
    """One kernel for the whole WFM mid-chain at constant rate: overlap-save
    channel filter on the complex stream, quadrature FM demod, overlap-save
    deemphasis filter on the (real) demodulated stream with stream pairs
    packed.  Both filters share the chunk length, so the DFT factor
    matrices are loaded once and the filtered complex intermediate never
    leaves VMEM (vs. two kernels: one [tile, n] complex HBM round-trip and
    one launch saved per tile).

    The last filtered sample per stream is emitted as a [tile, 1] output —
    the next step's demod continuity state (the intermediate it belongs to
    is otherwise never materialized).  Extracted with a masked reduction:
    lane-offset slices are a Mosaic lowering hazard.
    """
    n1, n2 = plan.n1, plan.n2
    hp, ho = plan.hp, plan.ho
    n = ho * n2
    pair = tile // 2
    pipe_full = plan.pipeline(tile)
    pipe_pair = plan.pipeline(pair)
    nc = len(plan.consts)
    demod = _make_demod(tile, n)
    pair_filter = _make_pair_filter(pipe_pair, pair, n1, n2, hp)

    def kernel(*refs):
        (prevr, previ, curr, curi, plr, pli, prevd, lastout, havep,
         fac, r1r, r1i, r2r, r2i) = refs[:14]
        consts = tuple(c[:] for c in refs[14:14 + nc])
        out, dout, flr, fli = refs[14 + nc:]
        # --- channel filter: overlap-save on [prev || cur] (complex) ---
        xr = jnp.concatenate(
            [prevr[:].reshape(tile, hp, n2),
             curr[:].reshape(tile, ho, n2)], axis=1)
        xi = jnp.concatenate(
            [previ[:].reshape(tile, hp, n2),
             curi[:].reshape(tile, ho, n2)], axis=1)
        f1r, f1i = pipe_full(xr, xi, r1r[:], r1i[:], *consts)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
        lastcol = col == (n - 1)
        zero = jnp.zeros_like(f1r)
        flr[:] = jnp.sum(jnp.where(lastcol, f1r, zero), axis=1,
                         keepdims=True)
        fli[:] = jnp.sum(jnp.where(lastcol, f1i, zero), axis=1,
                         keepdims=True)
        # --- quadrature demod on the in-register filtered stream ---
        d = demod(f1r, f1i, plr[:], pli[:], lastout[:], havep[:], fac[:])
        dout[:] = d
        # --- deemphasis filter, stream pairs packed ---
        out[:] = pair_filter(prevd[:], d, r2r[:], r2i[:], consts)

    return kernel


def fused_filter_demod_filter(prevr, previ, curr, curi,
                              prev_last_r, prev_last_i, prevd,
                              last_out, have_prev,
                              r1_gr, r1_gi, r2_gr, r2_gi,
                              factor, tile: int = None, precision=None):
    """Channel filter + FM demod + deemphasis filter in one kernel.

    ``prevr/previ``: [batch, m] overlap-save history planes of the
    pre-filter complex stream (m = n in the coupled geometry,
    src/blocks/filters.rs:240-259); ``curr/curi``: [batch, n] current
    chunk planes; ``prev_last_*``: [batch] last sample of the previous
    *filtered* chunk (demod continuity — returned by the previous call);
    ``prevd``: [batch, m] previous demodulated history;
    ``last_out``/``have_prev``: [batch] demod output continuity;
    ``r1_*``/``r2_*``: response grid planes from :func:`response_to_grid`
    (the deemphasis response must come from a real impulse response);
    ``factor``: demod factor (float or traced scalar/[batch]).

    Returns (y [batch, n] filtered audio, d [batch, n] demod chunk,
    f1_last_r, f1_last_i [batch] last filtered sample).  Batch must be
    even.
    """
    b, n = curr.shape
    m = prevr.shape[1]
    if prevd.shape[1] != m:
        raise ValueError("merged kernel requires equal channel/deemphasis "
                         "history lengths")
    if tile is None:
        tile = 2 * config.pallas_tile()   # pair-packed: tile counts streams
    tile = min(tile, b)
    if b % tile or tile % 2:
        tile = 2
    assert b % tile == 0
    plan = _filter_plan(m, n, precision)
    const_arrays = plan.const_arrays()
    kernel = _make_filter_demod_filter_kernel(plan, tile)
    fac = jnp.broadcast_to(jnp.asarray(factor, jnp.float32), (b,))
    grid = (b // tile,)
    row = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    col = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pair = tile // 2
    out3 = pl.BlockSpec((pair, 2, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out, dout, flr, fli = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(m), row(m), row(n), row(n)]
                 + [col, col, row(m), col, col, col]
                 + [const_spec] * (4 + len(const_arrays)),
        out_specs=[out3, row(n), col, col],
        out_shape=[jax.ShapeDtypeStruct((b // 2, 2, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1), jnp.float32)],
    )(prevr, previ, curr, curi, prev_last_r[:, None], prev_last_i[:, None],
      prevd, last_out[:, None], have_prev[:, None], fac[:, None],
      r1_gr, r1_gi, r2_gr, r2_gi, *const_arrays)
    return out.reshape(b, n), dout, flr[:, 0], fli[:, 0]
