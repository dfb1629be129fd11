"""Fused receiver front end: FreqShifter + Downsampler in one kernel.

Semantically identical to ``Chain(FreqShifter.with_shift(s),
Downsampler(rate, bw))`` — same rational-phase mixer (zero drift, same
tables) and the same rational decimation plan — but executed as a single
VMEM-resident Pallas kernel (``ops/pallas_frontend.py``), ~4x faster than
the separate blocks on TPU (the mixed intermediate never touches HBM).

Constraints (checked at bind; use the separate blocks otherwise):
chunk = outer*128 with a 128-lane oscillator inner block, plus the
generalized super-row decimation support (``decimate_supported``: ANY
integer p via lcm(p,128)-lane super-rows, long FIRs spill across weight
slabs, VMEM-budgeted — the r4 generalization; previously 128 % p == 0).
c64 streams only (the kernel is f32).  Time-sharded execution is
supported (``parallel/time_shard.py`` rebuilds the mixed-domain history
halo from the neighbor's raw tail over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math import round_half_away
from ..numbers import TAU
from ..ops.pallas_frontend import LANES, fused_mix_decimate
from ..ops.polyphase import plan_downsample
from .base import Block, BoundBlock, StreamSig
from .transform import (_inner_block, _shift_param_update,
                        _shift_tables, fold_phase_state)

__all__ = ["MixerDecimator", "FmDemodFilter", "FilterDemodFilter"]


class _BoundMixerDecimator(BoundBlock):
    def __init__(self, sig: StreamSig, shift: float, precision_hz: float,
                 output_rate: float, bandwidth: float, quality: float):
        self.in_sig = sig
        self.current_shift = float(shift)   # readable (transform.rs:380)
        n = sig.chunk_len
        self.denom = round_half_away((sig.sample_rate / precision_hz))
        numer = round_half_away((self.denom * shift / sig.sample_rate))
        ta, tb, adv = _shift_tables(n, self.denom, numer)
        plan = plan_downsample(sig.sample_rate, output_rate, bandwidth,
                               quality)
        self.plan = plan
        out_len = plan.out_len(n)
        self.out_sig = StreamSig(sig.batch, out_len, output_rate)
        if not self.supported(sig):
            raise ValueError(
                "MixerDecimator kernel constraints unmet; use "
                "FreqShifter + Downsampler")
        # Decimation taps are bind-time constants (the Pallas weight
        # matrix is assembled host-side); only the mixer tables are traced.
        self.params = {"table_a": ta, "table_b": tb, "adv": adv}

    @staticmethod
    def _plan_ok(n, plan, inner):
        # Generalized super-row decimation (any integer p, long FIRs via
        # slab spill — same scheme as ops/pallas_frontend.pallas_decimate);
        # the mixer additionally needs the factored-oscillator inner block
        # to be exactly one 128-lane vreg.
        from ..numbers import stream_mode
        from ..ops.pallas_frontend import decimate_supported
        return (stream_mode() == "c64" and inner == LANES
                and decimate_supported(n, plan))

    def supported(self, sig):
        return self._plan_ok(sig.chunk_len, self.plan,
                             _inner_block(sig.chunk_len))

    def init_state(self):
        b = self.in_sig.batch
        return {
            "k0": np.zeros((b,), np.int32),
            "start_phase": np.zeros((b,), np.float32),
            "histr": np.zeros((b, self.plan.hist), np.float32),
            "histi": np.zeros((b, self.plan.hist), np.float32),
        }

    def process(self, params, state, x, reset):
        denom = self.denom
        theta0 = (state["start_phase"]
                  + state["k0"].astype(jnp.float32) * np.float32(TAU / denom))
        ta = params["table_a"]
        tb = params["table_b"]
        outr, outi, nhr, nhi = fused_mix_decimate(
            jnp.real(x), jnp.imag(x),
            jnp.real(ta).astype(jnp.float32), jnp.imag(ta).astype(jnp.float32),
            jnp.real(tb).astype(jnp.float32), jnp.imag(tb).astype(jnp.float32),
            jnp.cos(theta0), jnp.sin(theta0),
            state["histr"], state["histi"],
            self.plan.kernel, self.plan.p, self.plan.q)
        new_state = {
            "k0": (state["k0"] + params["adv"]) % denom,
            "start_phase": state["start_phase"],
            "histr": nhr,
            "histi": nhi,
        }
        return new_state, jax.lax.complex(outr, outi)

    # Same retune API (and shared implementation) as _BoundFreqShifter.
    def shift_params(self, shift: float):
        self.current_shift = float(shift)
        return {**self.params,
                **_shift_param_update(self.in_sig.chunk_len, self.denom,
                                      self.in_sig.sample_rate, shift)}

    def retune(self, params, state, shift: float):
        return self.shift_params(shift), fold_phase_state(state, self.denom)


class MixerDecimator(Block):
    """Fused frequency shift + decimation front end."""

    def __init__(self, shift: float, output_rate: float, bandwidth: float,
                 quality: float = 3.0, precision: float = 1.0):
        self.shift = float(shift)
        self.precision = float(precision)
        self.output_rate = float(output_rate)
        self.bandwidth = float(bandwidth)
        self.quality = float(quality)

    def bind(self, sig: StreamSig) -> _BoundMixerDecimator:
        return _BoundMixerDecimator(sig, self.shift, self.precision,
                                    self.output_rate, self.bandwidth,
                                    self.quality)


class _BoundFmDemodFilter(BoundBlock):
    @property
    def output_is_real(self):
        return True

    def shard_batch_ok(self, ndev: int) -> bool:
        # Pair-packed kernel (ops/pallas_filter.py fused_demod_filter):
        # the *local* batch must stay even under stream sharding.
        b = self.in_sig.batch
        return b % ndev == 0 and (b // ndev) % 2 == 0

    def __init__(self, sig: StreamSig, deviation: float, freq_resp, window,
                 ir_len=None):
        from ..ops.pallas_filter import supported as _filt_supported
        from .filters import design_impulse_response
        self.in_sig = self.out_sig = sig
        self.valid_from = 1  # overlap-save warmup, like _BoundFilter
        n = sig.chunk_len
        m = n if ir_len is None else int(ir_len)
        if not 0 < m <= n:
            raise ValueError(f"ir_len {m} must be in (0, chunk_len {n}]")
        self.ir_len = m
        if not _filt_supported(n, m) or sig.batch % 2:
            raise ValueError("FmDemodFilter kernel constraints unmet "
                             "(chunk size / even batch); use FmDemod + "
                             "Filter")
        ir = design_impulse_response(freq_resp, window, m, sig.sample_rate)
        peak = max(float(np.abs(ir.real).max()), 1e-30)
        if np.abs(ir.imag).max() > 1e-9 * peak:
            raise ValueError("FmDemodFilter requires a real impulse "
                             "response (conjugate-symmetric gains)")
        from .filters import extend_response
        # Both the response and the demod factor are traced params: a
        # set_deviation retune swaps a scalar, no recompile — matching the
        # reference's per-chunk watch-channel read
        # (src/blocks/modulation.rs:154-157).
        self.params = {
            "response": extend_response(ir, pad=n).astype(np.complex64),
            "factor": np.float32(sig.sample_rate / deviation / TAU),
        }

    def init_state(self):
        b = self.in_sig.batch
        return {
            "plr": np.zeros((b,), np.float32),
            "pli": np.zeros((b,), np.float32),
            "prevd": np.zeros((b, self.ir_len), np.float32),
            "last_out": np.zeros((b,), np.float32),
            "have_prev": np.zeros((b,), np.float32),
        }

    def process(self, params, state, x, reset):
        from ..ops.pallas_filter import fused_demod_filter, response_grid
        n = self.in_sig.chunk_len
        grid = response_grid(params["response"])
        have = jnp.where(reset, 0.0, state["have_prev"])
        # An interrupt also clears the filter tail (the reference's Filter
        # drops previous_chunk on is_interrupt events).
        prevd = jnp.where(reset[:, None], jnp.zeros_like(state["prevd"]),
                          state["prevd"])
        y, d = fused_demod_filter(
            jnp.real(x), jnp.imag(x),
            state["plr"], state["pli"], prevd,
            state["last_out"], have,
            jnp.real(grid).astype(jnp.float32),
            jnp.imag(grid).astype(jnp.float32),
            params["factor"])
        new_state = {
            "plr": jnp.real(x[:, -1]).astype(jnp.float32),
            "pli": jnp.imag(x[:, -1]).astype(jnp.float32),
            "prevd": d[:, n - self.ir_len:],
            "last_out": d[:, -1],
            "have_prev": jnp.ones_like(have),
        }
        return new_state, jax.lax.complex(y, jnp.zeros_like(y))


class _BoundFilterDemodFilter(BoundBlock):
    @property
    def output_is_real(self):
        return True

    def shard_batch_ok(self, ndev: int) -> bool:
        # Pair-packed kernel: even local batch required (see
        # _BoundFmDemodFilter).
        b = self.in_sig.batch
        return b % ndev == 0 and (b // ndev) % 2 == 0

    def __init__(self, sig: StreamSig, freq_resp, window, deviation: float,
                 deemph_resp, deemph_window, ir_len=None):
        from ..ops.pallas_filter import supported as _filt_supported
        from .filters import design_impulse_response, extend_response
        self.in_sig = self.out_sig = sig
        # Two cascaded overlap-save warmups: output chunk 0 sees a zero
        # channel-filter tail AND a zero deemphasis tail; chunk 1 still
        # sees chunk 0's (warmup-tainted) demod as its filter tail.
        self.valid_from = 2
        self.window = window
        self.deemph_window = deemph_window
        n = sig.chunk_len
        m = n if ir_len is None else int(ir_len)
        if not 0 < m <= n:
            raise ValueError(f"ir_len {m} must be in (0, chunk_len {n}]")
        self.ir_len = m
        if not _filt_supported(n, m) or sig.batch % 2:
            raise ValueError("FilterDemodFilter kernel constraints unmet "
                             "(chunk size / even batch); use Filter + "
                             "FmDemod + Filter")
        ir2 = design_impulse_response(deemph_resp, deemph_window, m,
                                      sig.sample_rate)
        peak = max(float(np.abs(ir2.real).max()), 1e-30)
        if np.abs(ir2.imag).max() > 1e-9 * peak:
            raise ValueError("FilterDemodFilter requires a real deemphasis "
                             "impulse response (conjugate-symmetric gains)")
        ir1 = design_impulse_response(freq_resp, window, m, sig.sample_rate)
        # Both responses and the demod factor are traced params: Filter
        # update (src/blocks/filters.rs:279-297) and set_deviation
        # (src/blocks/modulation.rs:154-157) retunes swap values, no
        # recompile.
        self.params = {
            "response1": extend_response(ir1, pad=n).astype(np.complex64),
            "response2": extend_response(ir2, pad=n).astype(np.complex64),
            "factor": np.float32(sig.sample_rate / deviation / TAU),
        }

    def init_state(self):
        b, m = self.in_sig.batch, self.ir_len
        return {
            "prev": np.zeros((b, m), np.complex64),
            "plr": np.zeros((b,), np.float32),
            "pli": np.zeros((b,), np.float32),
            "prevd": np.zeros((b, m), np.float32),
            "last_out": np.zeros((b,), np.float32),
            "have_prev": np.zeros((b,), np.float32),
        }

    @staticmethod
    def _grid(response, n=None):
        from ..ops.pallas_filter import response_grid
        return response_grid(response)

    def process(self, params, state, x, reset):
        from ..ops.pallas_filter import fused_filter_demod_filter
        n = self.in_sig.chunk_len
        g1 = self._grid(params["response1"])
        g2 = self._grid(params["response2"])
        # An interrupt clears both filter tails and the demod continuity
        # (the reference's Filter drops previous_chunk, FmDemod repeats the
        # last output on the first post-gap sample).
        prev = jnp.where(reset[:, None], jnp.zeros_like(state["prev"]),
                         state["prev"])
        prevd = jnp.where(reset[:, None], jnp.zeros_like(state["prevd"]),
                          state["prevd"])
        have = jnp.where(reset, 0.0, state["have_prev"])
        y, d, flr, fli = fused_filter_demod_filter(
            jnp.real(prev), jnp.imag(prev),
            jnp.real(x), jnp.imag(x),
            state["plr"], state["pli"], prevd,
            state["last_out"], have,
            jnp.real(g1).astype(jnp.float32),
            jnp.imag(g1).astype(jnp.float32),
            jnp.real(g2).astype(jnp.float32),
            jnp.imag(g2).astype(jnp.float32),
            params["factor"])
        m = self.ir_len
        new_state = {
            "prev": x[:, x.shape[1] - m:],
            "plr": flr,
            "pli": fli,
            "prevd": d[:, d.shape[1] - m:],
            "last_out": d[:, -1],
            "have_prev": jnp.ones_like(have),
        }
        return new_state, jax.lax.complex(y, jnp.zeros_like(y))

    def update_filter_params(self, freq_resp, window=None):
        """Redesign the channel-filter response host-side (analog of
        ``Filter::update``, src/blocks/filters.rs:279-297)."""
        from .filters import design_impulse_response, extend_response
        w = window if window is not None else self.window
        ir = design_impulse_response(freq_resp, w, self.ir_len,
                                     self.in_sig.sample_rate)
        r = extend_response(ir, pad=self.in_sig.chunk_len)
        return {**self.params, "response1": r.astype(np.complex64)}


class FilterDemodFilter(Block):
    """Fused channel filter + FM demodulator + deemphasis filter.

    Equals ``Chain(Filter.new(resp), FmDemod(dev),
    Filter.with_window(deemph, win2))`` in a single VMEM-resident Pallas
    kernel: both overlap-save filters share one set of DFT factor matrices
    and the filtered complex intermediate never touches HBM.
    """

    def __init__(self, freq_resp, deviation: float, deemph_resp,
                 window=None, deemph_window=None, ir_len=None):
        from ..windowing import Kaiser, Rectangular
        self.freq_resp = freq_resp
        self.deviation = float(deviation)
        self.deemph_resp = deemph_resp
        self.window = (window if window is not None
                       else Kaiser.with_null_at_bin(2.0))
        self.deemph_window = (deemph_window if deemph_window is not None
                              else Rectangular())
        self.ir_len = ir_len

    def bind(self, sig: StreamSig) -> _BoundFilterDemodFilter:
        return _BoundFilterDemodFilter(sig, self.freq_resp, self.window,
                                       self.deviation, self.deemph_resp,
                                       self.deemph_window, self.ir_len)


class FmDemodFilter(Block):
    """Fused quadrature FM demodulator + overlap-save filter.

    Equals ``Chain(FmDemod(dev), Filter.with_window(resp, win))`` for
    real-impulse-response filters, in one VMEM-resident Pallas kernel with
    stream pairs sharing each complex transform.
    """

    def __init__(self, deviation: float, freq_resp, window=None,
                 ir_len=None):
        from ..windowing import Rectangular
        self.deviation = float(deviation)
        self.freq_resp = freq_resp
        self.window = window if window is not None else Rectangular()
        self.ir_len = ir_len

    def bind(self, sig: StreamSig) -> _BoundFmDemodFilter:
        return _BoundFmDemodFilter(sig, self.deviation, self.freq_resp,
                                   self.window, self.ir_len)
