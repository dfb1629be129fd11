"""Fused mixer + decimator front end as one Pallas kernel.

The first two stages of a receive chain run at the full input rate and are
both memory-bound: the complex mixer (one multiply per sample) and the
rational decimating FIR.  Unfused, the mixed intermediate makes a full HBM
round trip.  This kernel keeps it in VMEM: per stream-tile it

1. mixes the chunk with the factored phasor tables
   (``osc[a*inner + b] = p0 * A[a] * B[b]``, see blocks/transform.py),
2. prepends the carried history (already-mixed tail of the previous
   chunk),
3. decimates via the same lcm(p,128)-lane super-row banded GEMM as
   :func:`pallas_decimate` (any integer ratio, long FIRs spill across
   weight slabs), emitting the mixed-domain history tail for the next
   step alongside the outputs.

Only the raw chunk is read from HBM and only the decimated output (q/p of
the input) plus a tiny history slab are written back.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiorust_tpu import config
from radiorust_tpu.ops.mxu import make_dot

__all__ = ["fused_mix_decimate", "pallas_decimate", "decimate_supported"]


LANES = 128


from .mxu import pallas_call as _pallas_call  # off-TPU interpret policy


def _make_kernel(n, hist, p, q, outer, inner, tile, slabs, precision):
    # Same super-row banded-GEMM decimation as _make_decim_kernel (any
    # integer p), preceded by the in-VMEM mix.  For p | 128 the layout
    # reduces to the original 128-lane row-pair scheme bit for bit
    # (S = 128, slabs = 2 for any Kw <= 128 + p).
    S = _super_row(p)
    M = n // p  # decimation periods per chunk (chunk must align)
    wper = S // p                      # outputs per super-row
    nsup = M // wper                   # super-rows of outputs
    assert M % wper == 0
    padded = (nsup + slabs - 1) * S

    def kernel(xr, xi, oscr_ref, osci_ref, p0r, p0i, hr, hi, w3,
               outr, outi, newhr, newhi):
        # --- mix the current chunk (VPU) ---
        cxr = xr[:].reshape(tile, outer, inner)
        cxi = xi[:].reshape(tile, outer, inner)
        oscr = oscr_ref[:]                      # [outer, inner]
        osci = osci_ref[:]
        mr0 = cxr * oscr[None] - cxi * osci[None]
        mi0 = cxr * osci[None] + cxi * oscr[None]
        # per-stream start phasor ([tile, 1] block -> broadcast)
        pr = p0r[:][:, :, None]
        pi = p0i[:][:, :, None]
        mr = (mr0 * pr - mi0 * pi).reshape(tile, n)
        mi = (mr0 * pi + mi0 * pr).reshape(tile, n)
        # --- concat history (mixed domain) ---
        bufr = jnp.concatenate([hr[:], mr], axis=-1)
        bufi = jnp.concatenate([hi[:], mi], axis=-1)
        newhr[:] = bufr[:, -hist:]
        newhi[:] = bufi[:, -hist:]
        # --- decimate: lane-aligned super-row banded GEMM ---
        # Window for output m spans buf[m*p : m*p + Kw]; windows are
        # lane-aligned per S-lane super-row, long windows spill into the
        # next `slabs-1` super-rows via split weight slabs — all views
        # whole vregs (offset concats are a Mosaic lowering hazard).
        padr = jnp.pad(bufr, ((0, 0), (0, padded - (hist + n))))
        padi = jnp.pad(bufi, ((0, 0), (0, padded - (hist + n))))
        dot = make_dot(precision)
        w = w3[:]
        # re/im share the weights: stack along the matmul M dim (row-
        # independent => bit-identical) — one dot per slab, not two.
        pad = jnp.concatenate([padr, padi], axis=0)
        acc = None
        for k in range(slabs):
            Pk = pad[:, k * S: k * S + nsup * S].reshape(
                2 * tile * nsup, S)
            t = dot(Pk, w[k * S: (k + 1) * S],
                    (((1,), (0,)), ((), ())))
            acc = t if acc is None else acc + t
        y = acc.reshape(2, tile, nsup, wper * q)
        outr[:] = y[0]
        outi[:] = y[1]

    return kernel


def _super_row(p: int):
    """Window-alignment unit in lanes: 128 when p divides it (the
    original layout), else lcm(p, 128) — e.g. p=10 -> 640-lane
    super-rows of 64 windows each, still a whole number of 128-lane
    vregs so every view stays lane-aligned.  None when the unit (and
    with it the zero-padded weight slab) would get unreasonably large."""
    import math
    if LANES % p == 0:
        return LANES
    s = p // math.gcd(p, LANES) * LANES
    return s if s <= 2048 else None


_W3_VMEM_BUDGET = 6 * 1024 * 1024  # bytes for the banded weight slab


def decimate_supported(n: int, plan) -> bool:
    """Whether a rational plan fits the lane-aligned GEMM decimator:
    whole super-rows of outputs (``_super_row``), a downsample-style
    layout (``s0 == 0``, history = window minus one period), a nonzero
    history slab, and a banded weight that fits VMEM.  The weight is the
    [slabs*S, wper*q] zero-padded slab — for upsampling-heavy ratios
    (small p, large q: wper*q lanes per super-row) it can exceed the
    ~16 MB scoped VMEM (the WFM TX Upsampler's 64/3 plan wants a
    [768, 8192] = 25 MB slab; found by the r4 on-chip validation run),
    so such plans fall back to the XLA transposed-conv path."""
    s = _super_row(plan.p)
    if s is None:
        return False
    wper = s // plan.p
    kw = plan.kernel.shape[-1]
    slabs = 1 + -(-(kw - plan.p) // s)
    if slabs * s * wper * plan.q * 4 > _W3_VMEM_BUDGET:
        return False
    return (plan.s0 == 0 and plan.hist == kw - plan.p
            and plan.hist > 0 and n % plan.p == 0
            and (n // plan.p) % wper == 0)


def _make_decim_kernel(n, hist, p, q, tile, nplanes, slabs, precision):
    S = _super_row(p)
    M = n // p
    wper = S // p
    nsup = M // wper
    padded = (nsup + slabs - 1) * S

    def kernel(*refs):
        xs = refs[:nplanes]
        hs = refs[nplanes:2 * nplanes]
        w3 = refs[2 * nplanes]
        outs = refs[2 * nplanes + 1: 2 * nplanes + 1 + nplanes]
        newhs = refs[2 * nplanes + 1 + nplanes:]
        dot = make_dot(precision)
        w = w3[:]
        pads = []
        for ix in range(nplanes):
            buf = jnp.concatenate([hs[ix][:], xs[ix][:]], axis=-1)
            newhs[ix][:] = buf[:, -hist:]
            pads.append(jnp.pad(buf, ((0, 0), (0, padded - (hist + n)))))
        # Both planes share the weights, so they stack along the matmul
        # M dim (row-independent => bit-identical to separate dots):
        # one dot per slab instead of one per plane per slab.
        pad = pads[0] if nplanes == 1 else jnp.concatenate(pads, axis=0)
        acc = None
        # Window for output m spans buf[m*p : m*p + Kw]; windows are
        # lane-aligned per S-lane super-row, and long windows spill
        # into the next `slabs-1` super-rows, so each super-row of
        # outputs pairs with its successors via split (banded) weight
        # slabs — all views whole vregs.
        for k in range(slabs):
            Pk = pad[:, k * S: k * S + nsup * S].reshape(
                nplanes * tile * nsup, S)
            t = dot(Pk, w[k * S: (k + 1) * S],
                    (((1,), (0,)), ((), ())))
            acc = t if acc is None else acc + t
        y = acc.reshape(nplanes, tile, nsup, wper * q)
        for ix in range(nplanes):
            outs[ix][:] = y[ix]

    return kernel


def pallas_decimate(planes, hplanes, kernel_matrix, p: int, q: int,
                    tile: int = None, precision=None):
    """Rational decimation as a lane-aligned banded GEMM.

    ``planes``: tuple of [batch, n] float32 arrays (one for real streams,
    two for complex); ``hplanes``: matching [batch, hist] history slabs;
    ``kernel_matrix``: [q, Kw] from the rational plan (any window length —
    long anti-alias FIRs spill across row slabs).  Returns
    (out_planes [batch, (n//p)*q], new_hist_planes).  This replaces XLA's
    strided-conv lowering, which collapses for long kernels (measured 4x
    slower for a 6k-tap fused deemphasis, and dominating the WFM tail at
    295 taps).
    """
    nplanes = len(planes)
    b, n = planes[0].shape
    hist = hplanes[0].shape[-1]
    Kw = kernel_matrix.shape[-1]
    # Layout preconditions (decimate_supported); a violating call would
    # compute silently misaligned windows, not error.
    S = _super_row(p)
    assert S is not None and n % p == 0, (p, n)
    wper = S // p
    assert (n // p) % wper == 0, (n, p)
    assert hist == Kw - p and hist > 0, (hist, Kw, p)
    slabs = 1 + -(-(Kw - p) // S)
    if tile is None:
        tile = config.pallas_tile()
    tile = min(tile, b)
    if b % tile:
        tile = 1
    kernel = _make_decim_kernel(n, hist, p, q, tile, nplanes, slabs,
                                precision)
    # Banded weight assembly is trace-safe (the taps may arrive as traced
    # params through a jit boundary); static indices, so XLA constant-folds
    # it when the taps are constants.
    wt = jnp.asarray(kernel_matrix, jnp.float32).T
    w3 = jnp.zeros((slabs * S, wper * q), jnp.float32)
    for j in range(wper):
        w3 = jax.lax.dynamic_update_slice(w3, wt, (j * p, j * q))
    M = n // p
    nsup = M // wper
    grid = (b // tile,)
    row = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((tile, nsup, wper * q), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    results = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(n)] * nplanes + [row(hist)] * nplanes + [vec],
        out_specs=[out3] * nplanes + [row(hist)] * nplanes,
        out_shape=[jax.ShapeDtypeStruct((b, nsup, wper * q), jnp.float32)
                   ] * nplanes
        + [jax.ShapeDtypeStruct((b, hist), jnp.float32)] * nplanes,
    )(*planes, *hplanes, w3)
    outs = tuple(r.reshape(b, M * q) for r in results[:nplanes])
    return outs, tuple(results[nplanes:])


def fused_mix_decimate(xr, xi, ar, ai, br, bi, p0r, p0i, hr, hi,
                       kernel_matrix, p: int, q: int,
                       tile: int = None, precision=None):
    """Mix + decimate one chunk step.

    ``xr/xi``: [batch, n] raw input planes; ``ar..bi``: factored oscillator
    tables ([outer], [inner]); ``p0r/p0i``: [batch] per-stream start
    phasor; ``hr/hi``: [batch, hist] mixed-domain history;
    ``kernel_matrix``: [q, Kw] from the rational plan.  Returns
    (outr, outi, new_hr, new_hi).
    """
    b, n = xr.shape
    hist = hr.shape[-1]
    Kw = kernel_matrix.shape[-1]
    outer = ar.shape[-1]
    inner = br.shape[-1]
    S = _super_row(p)
    assert S is not None and n % p == 0, (p, n)
    wper = S // p
    assert (n // p) % wper == 0, (n, p)
    assert hist == Kw - p and hist > 0, (hist, Kw, p)
    slabs = 1 + -(-(Kw - p) // S)
    if tile is None:
        tile = config.pallas_tile()
    tile = min(tile, b)
    if b % tile:
        tile = 1
    kernel = _make_kernel(n, hist, p, q, outer, inner, tile, slabs,
                          precision)
    # Oscillator outer product (tiny) computed in XLA, fed as a 2-D grid.
    oscr = ar[:, None] * br[None, :] - ai[:, None] * bi[None, :]
    osci = ar[:, None] * bi[None, :] + ai[:, None] * br[None, :]
    # Banded weights: W3[j*p + u, j*q + r] = W[r, u] over slab super-rows
    # (same layout as pallas_decimate).
    w3 = np.zeros((slabs * S, wper * q), np.float32)
    wt = np.asarray(kernel_matrix).T               # [Kw, q]
    for j in range(wper):
        w3[j * p: j * p + Kw, j * q: (j + 1) * q] = wt
    M = n // p
    out_len = M * q
    grid = (b // tile,)
    nsup = M // wper
    row = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((tile, nsup, wper * q), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    pvec = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outr, outi, nhr, nhi = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(n), row(n), vec(), vec(),
                  pvec, pvec, row(hist), row(hist), vec()],
        out_specs=[out3, out3, row(hist), row(hist)],
        out_shape=[jax.ShapeDtypeStruct((b, nsup, wper * q), jnp.float32),
                   jax.ShapeDtypeStruct((b, nsup, wper * q), jnp.float32),
                   jax.ShapeDtypeStruct((b, hist), jnp.float32),
                   jax.ShapeDtypeStruct((b, hist), jnp.float32)],
    )(xr, xi, oscr, osci, p0r[:, None], p0i[:, None], hr, hi,
      jnp.asarray(w3))
    return (outr.reshape(b, out_len), outi.reshape(b, out_len),
            nhr, nhi)
