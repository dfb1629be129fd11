"""Fused Pallas PFB channelizer + per-channel FM demod kernel.

MEASURED RESULT (tools/exp_channelizer.py, on-chip, batch 4 x 65536,
32768 steps/call): this kernel runs 47.7 us/step (5490 Msps) vs the XLA
Channelizer+FmDemod pair's 25.8 us (10145 Msps) — the fused kernel LOSES
2x.  The premise (XLA re-reads the input ~K times for the shifted-slice
FIR, so a single-read VMEM kernel should win) was wrong in practice: XLA
keeps the PFB near its HBM roofline, and the kernel's lane rolls /
half-lane slice handling cost more than the saved traffic.  Kept as an
off-by-default, equivalence-tested, time-shardable alternative
(``channelized_receiver(fuse=True)``); the XLA path is the default and
the bench headline.

Design: everything stays in VMEM — each input element is read once, the
K-tap branch FIR accumulates in registers, the 64-point branch DFT runs as
one block-diagonal [128, 128] matmul on the MXU (two 64-sample frames ride
one 128-lane row), and the per-channel quadrature demod happens on the
in-register channel values before a single [batch, n] real result leaves.

Layouts (M = 64 channels, lane width 128 = 2 frames):

- input planes ``xr/xi``: [tile, hist + n] with ``hist = (K+1)*M`` history
  lanes prepended — (K-1)*M for the FIR window plus TWO extra frames so
  the kernel recomputes the previous chunk's last channel frame itself:
  demod continuity needs no carried channel state (the same window always
  reproduces the same value), only the raw-input history the channelizer
  carries anyway.  FIR tap ``k`` reads the slice at lane offset ``k*M`` —
  aligned for even ``k``; odd ``k`` reads the same offsets from a
  roll-by-M copy (lane slices must be 128-aligned on Mosaic).
- channel values ``y``: flat [tile, n + 2M] frame-major — frame ``t``
  channel ``c`` at lane ``(t+2)*M + c``.  The previous frame for demod
  continuity is a roll by M; the first two (warmup) frames are dropped by
  the caller.

Reference mapping: this computes exactly ``Channelizer(M, K) ->
FmDemod(dev)`` (blocks/channelize.py + blocks/modulation.py; the
construction replacing N mixer+decimator chains, cf.
/root/reference/examples/bandwidth_meter/main.rs:54-57).  The
break/repeat-last-output demod semantics are restored by the caller on the
first output frame (blocks/channelize.py::_BoundChannelizerDemod).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiorust_tpu import config
from radiorust_tpu.ops.mxu import make_dot
from radiorust_tpu.ops.pallas_filter import _atan2_poly

__all__ = ["fused_pfb_demod", "pfb_demod_supported", "HIST_FRAMES"]

LANES = 128
M = 64   # channels; fixed at half a lane row (two frames per 128 lanes)
HIST_FRAMES = 2  # warmup frames recomputed per chunk (continuity + drop)


from .mxu import pallas_call as _pallas_call  # off-TPU interpret policy


@functools.lru_cache(maxsize=4)
def _dft_blockdiag():
    """[128, 128] block-diagonal analysis DFT: two 64-point transforms,
    one per frame half of a lane row."""
    w = np.exp(-2j * np.pi * np.outer(np.arange(M), np.arange(M)) / M)
    blk = np.zeros((LANES, LANES), np.complex128)
    blk[:M, :M] = w
    blk[M:, M:] = w
    return blk.real.astype(np.float32), blk.imag.astype(np.float32)


def pfb_demod_supported(n: int, num_channels: int,
                        taps_per_branch: int) -> bool:
    return (num_channels == M and n % LANES == 0 and n >= LANES
            and taps_per_branch >= 1)


def _make_kernel(n_ext: int, k: int, tile: int, precision=None):
    total = (k - 1) * M + n_ext   # lanes of input each frame window spans
    rows = n_ext // LANES
    dot = make_dot(precision)

    def mm3(a, w):
        # [tile, rows, 128] x [128, 128] contracting the lane dim.
        return dot(a, w, (((2,), (0,)), ((), ())))

    def kernel(xr, xi, fac, tapv, wr, wi, dout):
        # --- branch FIR: one read of x, K in-VMEM shifted FMAs ----------
        xr_ = xr[:]
        xi_ = xi[:]
        # Odd taps sit at 64-offset lanes; a single roll realigns them.
        xr_o = pltpu.roll(xr_, total - M, 1)
        xi_o = pltpu.roll(xi_, total - M, 1)
        vr = jnp.zeros((tile, n_ext), jnp.float32)
        vi = jnp.zeros((tile, n_ext), jnp.float32)
        for j in range(k):
            tj = tapv[j, :][None, :]
            if j % 2 == 0:
                vr = vr + xr_[:, j * M: j * M + n_ext] * tj
                vi = vi + xi_[:, j * M: j * M + n_ext] * tj
            else:
                off = (j - 1) * M
                vr = vr + xr_o[:, off: off + n_ext] * tj
                vi = vi + xi_o[:, off: off + n_ext] * tj
        # --- branch DFT on the MXU (block-diag two-frame transform) -----
        v3r = vr.reshape(tile, rows, LANES)
        v3i = vi.reshape(tile, rows, LANES)
        wr_ = wr[:]
        wi_ = wi[:]
        yr = (mm3(v3r, wr_) - mm3(v3i, wi_)).reshape(tile, n_ext)
        yi = (mm3(v3r, wi_) + mm3(v3i, wr_)).reshape(tile, n_ext)
        # --- per-channel quadrature FM demod -----------------------------
        sr = pltpu.roll(yr, M, 1)          # previous frame, same channel
        si = pltpu.roll(yi, M, 1)
        pre = yr * sr + yi * si
        pim = yi * sr - yr * si
        # Frame -2 (lanes < M) sees wrapped garbage as its predecessor;
        # the caller drops the first HIST_FRAMES frames.
        dout[:] = _atan2_poly(pim, pre) * fac[:]

    return kernel


def fused_pfb_demod(xr, xi, factor, taps, tile: int = None, precision=None):
    """Channelize + demodulate one chunk.

    ``xr/xi``: [batch, (K+1)*M + n] f32 planes — ``HIST_FRAMES + (K-1)``
    frames of raw-input history prepended to the n new samples;
    ``factor``: demod factor (scalar or [batch]); ``taps``: [K, M]
    prototype (branch-major).

    Returns ``d [batch, 2*M + n] f32``: frame-major demodulated stream —
    the first ``HIST_FRAMES`` frames are warmup (frame -2's predecessor is
    garbage; frame -1 is exact) and must be dropped by the caller.
    """
    b, total = xr.shape
    k, m = taps.shape
    assert m == M
    n_ext = total - (k - 1) * M
    assert n_ext % LANES == 0 and n_ext > LANES
    if tile is None:
        tile = config.pallas_tile()
    tile = min(tile, b)
    if b % tile:
        tile = 1
    # 64-periodic tap pattern tiled to full rows: tapv[j] repeats taps[j].
    # jnp: taps is a traced param when the caller jits over packed params.
    tapv = jnp.tile(jnp.asarray(taps, jnp.float32), (1, n_ext // M))
    wr, wi = _dft_blockdiag()
    kernel = _make_kernel(n_ext, k, tile, precision)
    fac = jnp.broadcast_to(jnp.asarray(factor, jnp.float32), (b,))
    grid = (b // tile,)
    row = lambda width: pl.BlockSpec((tile, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return _pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(total), row(total), row(1)] + [const] * 3,
        out_specs=row(n_ext),
        out_shape=jax.ShapeDtypeStruct((b, n_ext), jnp.float32),
    )(xr, xi, fac[:, None], jnp.asarray(tapv), jnp.asarray(wr),
      jnp.asarray(wi))
