#!/usr/bin/env python
"""On-chip filter/stage experiments (single process, in-session A/B).

Usage: python tools/exp_filter.py VARIANT [VARIANT...]

Each variant builds one jitted program `fn(seed, iters) -> checksum` that
runs `iters` feedback-chained steps of a workload at batch 64 on-device and
is timed by fetching the f32 checksum (the only trustworthy sync on the
relay backend — see CLAUDE.md).  Feedback uses per-step energy
normalization, a nonlinear op XLA cannot hoist, so each iteration truly
depends on the previous one.

Variants (options after ':'): tileN | high/highest/default (matmul
precision passes) | 3mul (Gauss 3-multiplication complex matmuls) |
block / cmm (force the block-matrix DFT matmuls ON / OFF — block is
the r4 default, so pass `cmm` to measure the classic pipeline) | fN1xN2
(RRTPU_FILTER_FACTORS transform split override) | s1rows
(streams-on-M stage-1 orientation experiment):
  chain                 full fused WFM chain (bench reference point)
  chain_unfused         literal block-for-block chain
  frontend              fused mixer+decimator kernel alone  (16384 -> 6144)
  filter1[:tileN][:high]  fused overlap-save kernel alone at 6144
  filter1_xla           matmul-FFT (unfused) filter at 6144
  demod[:tileN][:high]  fused demod+deemphasis kernel alone at 6144
  tail                  final downsampler+gain (6144 -> 768, XLA)
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc
    _cc.set_cache_dir(os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

from radiorust_tpu.blocks.base import StreamSig, pack_wire, unpack_wire
from radiorust_tpu.models.wfm import (WFM_INPUT_CHUNK, WFM_INPUT_RATE,
                                      wfm_receiver, _lowpass_100k,
                                      _deemphasis_band)

BATCH = int(os.environ.get("EXP_BATCH", "64"))
N_IN = WFM_INPUT_CHUNK          # 16384
N_MID = 6144                    # after 1.024M -> 384k decimation
MID_RATE = 384000.0


def _norm(y):
    # Nonlinear per-step renormalization: defeats algebraic hoisting and
    # keeps the feedback loop numerically bounded.
    e = jnp.mean(jnp.square(y)) + jnp.float32(1e-20)
    return y * jax.lax.rsqrt(e)


def _rand_planes(seed, shape):
    key = jax.random.key(seed)
    a = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    return a, b


def _filter1_grid():
    from radiorust_tpu.blocks.filters import design_response
    from radiorust_tpu.ops.pallas_filter import response_to_grid
    from radiorust_tpu.windowing import Kaiser
    r = design_response(_lowpass_100k, Kaiser.with_null_at_bin(2.0), N_MID,
                        MID_RATE)
    return response_to_grid(r.astype(np.complex64))


def _deemph_grid():
    from radiorust_tpu.blocks.filters import design_response
    from radiorust_tpu.ops.pallas_filter import response_to_grid
    from radiorust_tpu.windowing import Rectangular
    r = design_response(_deemphasis_band, Rectangular(), N_MID, MID_RATE)
    return response_to_grid(r.astype(np.complex64))


def build_chain(fused: bool, tail_pallas: bool = True, drop=(),
                mid: bool = False, n_in: int = None, ir_len=None):
    """``drop``: indexes into the chain's spec list to remove (subtractive
    profiling — e.g. fused chain is [MixerDecimator, Filter, FmDemodFilter,
    Downsampler, GainControl]; dropping Filter is shape-preserving).
    ``mid``: merge filter1+demod+deemph into the single FilterDemodFilter
    kernel.  ``n_in``/``ir_len``: decoupled-geometry A/B — bind at a
    larger input chunk with the filter IRs pinned at 6144 taps (same
    designed responses, more new samples per transform)."""
    from radiorust_tpu.blocks.base import Chain
    N_IN = n_in or globals()["N_IN"]
    sig = StreamSig(BATCH, N_IN, WFM_INPUT_RATE)
    spec = wfm_receiver(fuse_frontend=fused, fuse_demod=fused,
                        fuse_mid=mid, filter_ir_len=ir_len)
    if drop:
        spec = Chain(*[b for i, b in enumerate(spec.specs) if i not in drop])
    bound = spec.bind(sig)
    if not tail_pallas:
        from radiorust_tpu.blocks.resampling import _BoundResampler
        for blk in bound.blocks:
            if isinstance(blk, _BoundResampler):
                blk._use_pallas = lambda: False
    pparams = pack_wire(bound.params)
    pstate = pack_wire(bound.init_state())

    @jax.jit
    def fn(seed, iters):
        params = unpack_wire(pparams)
        xr, xi = _rand_planes(seed, (BATCH, N_IN))
        reset = jnp.zeros((BATCH,), bool)

        def body(i, carry):
            st, xr, xi, acc = carry
            st, y = bound.process(params, st, jax.lax.complex(xr, xi),
                                  reset)
            yr = _norm(jnp.real(y))
            yi = _norm(jnp.imag(y) + yr)     # demod output is real: mix in
            rep = -(-N_IN // y.shape[-1])
            nxr = jnp.tile(yr, (1, rep))[:, :N_IN]
            nxi = jnp.tile(yi, (1, rep))[:, :N_IN]
            return st, nxr, nxi, acc + jnp.sum(jnp.square(jnp.real(y)))

        st = unpack_wire(pstate)
        _, _, _, acc = jax.lax.fori_loop(
            0, iters, body, (st, xr, xi, jnp.float32(0.0)))
        return acc

    return fn, BATCH * N_IN


def build_feedback(width):
    """Pure harness overhead: the feedback loop body (norm + tile) with an
    identity stage.  Subtract from isolated stage variants of the same
    width to get the stage's net cost."""
    @jax.jit
    def fn(seed, iters):
        xr, xi = _rand_planes(seed, (BATCH, width))

        def body(i, carry):
            xr, xi, acc = carry
            yr = _norm(xr)
            yi = _norm(xi + yr)
            return yr, yi, acc + jnp.sum(jnp.square(yr))

        _, _, acc = jax.lax.fori_loop(
            0, iters, body, (xr, xi, jnp.float32(0.0)))
        return acc

    return fn, BATCH * width


def build_frontend(which="fused", n_in=None):
    from radiorust_tpu.blocks.frontend import MixerDecimator
    from radiorust_tpu.blocks.resampling import Downsampler
    from radiorust_tpu.blocks.transform import FreqShifter
    N_IN = n_in or globals()["N_IN"]
    sig = StreamSig(BATCH, N_IN, WFM_INPUT_RATE)
    spec = {"fused": lambda: MixerDecimator(-57000.0, MID_RATE, 200000.0),
            "mixer": lambda: FreqShifter.with_shift(-57000.0),
            "decim": lambda: Downsampler(MID_RATE, 200000.0)}[which]()
    bound = spec.bind(sig)
    pparams = pack_wire(bound.params)
    pstate = pack_wire(bound.init_state())

    @jax.jit
    def fn(seed, iters):
        params = unpack_wire(pparams)
        xr, xi = _rand_planes(seed, (BATCH, N_IN))
        reset = jnp.zeros((BATCH,), bool)

        def body(i, carry):
            st, xr, xi, acc = carry
            st, y = bound.process(params, st, jax.lax.complex(xr, xi),
                                  reset)
            yr = _norm(jnp.real(y))
            yi = _norm(jnp.imag(y))
            rep = -(-N_IN // y.shape[-1])
            nxr = jnp.tile(yr, (1, rep))[:, :N_IN]
            nxi = jnp.tile(yi, (1, rep))[:, :N_IN]
            return st, nxr, nxi, acc + jnp.sum(yr)

        st = unpack_wire(pstate)
        _, _, _, acc = jax.lax.fori_loop(
            0, iters, body, (st, xr, xi, jnp.float32(0.0)))
        return acc

    return fn, BATCH * N_IN


def build_filter1(tile=8, precision="highest"):
    from radiorust_tpu.ops.pallas_filter import fused_overlap_save
    gr, gi = _filter1_grid()
    prec = dict(highest=jax.lax.Precision.HIGHEST,
                high=jax.lax.Precision.HIGH,
                default=jax.lax.Precision.DEFAULT)[precision]

    @jax.jit
    def fn(seed, iters):
        xr, xi = _rand_planes(seed, (BATCH, N_MID))
        pr, pi = _rand_planes(seed + 1, (BATCH, N_MID))

        def body(i, carry):
            pr, pi, xr, xi, acc = carry
            outr, outi = fused_overlap_save(
                pr, pi, xr, xi, jnp.asarray(gr), jnp.asarray(gi),
                tile=tile, precision=prec)
            return (xr, xi, _norm(outr), _norm(outi),
                    acc + jnp.sum(jnp.square(outr)))

        _, _, _, _, acc = jax.lax.fori_loop(
            0, iters, body, (pr, pi, xr, xi, jnp.float32(0.0)))
        return acc

    return fn, BATCH * N_MID


def build_filter1_geom(X, tile=8, precision="highest", m=N_MID):
    """Decoupled-geometry standalone filter kernel: m=6144-tap IR, X new
    samples per step over an (X+m)-point transform (VERDICT r4 item 1).
    X=10240 -> 16384 = 128x128 full-tile factors; compare msps_equiv
    against filter1 (the coupled 12288 = 96x128 kernel)."""
    from radiorust_tpu.blocks.filters import (design_impulse_response,
                                              extend_response)
    from radiorust_tpu.ops.pallas_filter import (fused_overlap_save,
                                                 response_to_grid)
    from radiorust_tpu.windowing import Kaiser
    ir = design_impulse_response(_lowpass_100k, Kaiser.with_null_at_bin(2.0),
                                 m, MID_RATE)
    r = extend_response(ir, pad=X).astype(np.complex64)
    gr, gi = response_to_grid(r)
    prec = dict(highest=jax.lax.Precision.HIGHEST,
                high=jax.lax.Precision.HIGH,
                default=jax.lax.Precision.DEFAULT)[precision]

    @jax.jit
    def fn(seed, iters):
        xr, xi = _rand_planes(seed, (BATCH, X))
        pr, pi = _rand_planes(seed + 1, (BATCH, m))

        def body(i, carry):
            pr, pi, xr, xi, acc = carry
            outr, outi = fused_overlap_save(
                pr, pi, xr, xi, jnp.asarray(gr), jnp.asarray(gi),
                tile=tile, precision=prec)
            return (xr[:, X - m:], xi[:, X - m:], _norm(outr), _norm(outi),
                    acc + jnp.sum(jnp.square(outr)))

        _, _, _, _, acc = jax.lax.fori_loop(
            0, iters, body, (pr, pi, xr, xi, jnp.float32(0.0)))
        return acc

    return fn, BATCH * X


def build_filter1_xla():
    from radiorust_tpu.blocks.filters import design_response
    from radiorust_tpu.ops.fft import fft, ifft
    from radiorust_tpu.windowing import Kaiser
    r = design_response(_lowpass_100k, Kaiser.with_null_at_bin(2.0), N_MID,
                        MID_RATE).astype(np.complex64)
    rp = pack_wire(r)

    @jax.jit
    def fn(seed, iters):
        resp = unpack_wire(rp)
        xr, xi = _rand_planes(seed, (BATCH, N_MID))
        pr, pi = _rand_planes(seed + 1, (BATCH, N_MID))

        def body(i, carry):
            pr, pi, xr, xi, acc = carry
            buf = jnp.concatenate(
                [jax.lax.complex(pr, pi), jax.lax.complex(xr, xi)], axis=-1)
            y = ifft(fft(buf) * resp)[..., :N_MID]
            outr = jnp.real(y).astype(jnp.float32)
            outi = jnp.imag(y).astype(jnp.float32)
            return (xr, xi, _norm(outr), _norm(outi),
                    acc + jnp.sum(jnp.square(outr)))

        _, _, _, _, acc = jax.lax.fori_loop(
            0, iters, body, (pr, pi, xr, xi, jnp.float32(0.0)))
        return acc

    return fn, BATCH * N_MID


def build_demod(tile=8, precision="highest"):
    from radiorust_tpu.ops.pallas_filter import fused_demod_filter
    gr, gi = _deemph_grid()
    prec = dict(highest=jax.lax.Precision.HIGHEST,
                high=jax.lax.Precision.HIGH,
                default=jax.lax.Precision.DEFAULT)[precision]
    factor = MID_RATE / 150000.0 / (2 * np.pi)

    @jax.jit
    def fn(seed, iters):
        xr, xi = _rand_planes(seed, (BATCH, N_MID))
        prevd = jnp.zeros((BATCH, N_MID), jnp.float32)
        zc = jnp.zeros((BATCH,), jnp.float32)

        def body(i, carry):
            xr, xi, prevd, acc = carry
            y, d = fused_demod_filter(
                xr, xi, xr[:, -1], xi[:, -1], prevd, zc,
                jnp.ones((BATCH,), jnp.float32),
                jnp.asarray(gr), jnp.asarray(gi), factor,
                tile=tile, precision=prec)
            yn = _norm(y)
            return (yn, jnp.roll(yn, 1, axis=-1), d,
                    acc + jnp.sum(jnp.square(y)))

        _, _, _, acc = jax.lax.fori_loop(
            0, iters, body, (xr, xi, prevd, jnp.float32(0.0)))
        return acc

    return fn, BATCH * N_MID


def build_tail(pallas=True):
    from radiorust_tpu.blocks.base import Chain
    from radiorust_tpu.blocks.resampling import Downsampler
    from radiorust_tpu.blocks.transform import GainControl
    sig = StreamSig(BATCH, N_MID, MID_RATE)
    bound = Chain(Downsampler(48000.0, 40000.0), GainControl(1.0)).bind(sig)
    bound.blocks[0].input_is_real = True  # as in the real chain
    if not pallas:
        bound.blocks[0]._use_pallas = lambda: False
    pparams = pack_wire(bound.params)
    pstate = pack_wire(bound.init_state())

    @jax.jit
    def fn(seed, iters):
        params = unpack_wire(pparams)
        xr, _ = _rand_planes(seed, (BATCH, N_MID))
        reset = jnp.zeros((BATCH,), bool)

        def body(i, carry):
            st, xr, acc = carry
            st, y = bound.process(
                params, st,
                jax.lax.complex(xr, jnp.zeros_like(xr)), reset)
            yr = _norm(jnp.real(y))
            rep = -(-N_MID // y.shape[-1])
            nxr = jnp.tile(yr, (1, rep))[:, :N_MID]
            return st, nxr, acc + jnp.sum(yr)

        st = unpack_wire(pstate)
        _, _, acc = jax.lax.fori_loop(
            0, iters, body, (st, xr, jnp.float32(0.0)))
        return acc

    return fn, BATCH * N_MID


def _with_modes(built, prec, cmm, tile=None, block=None, factors=None,
                s1rows=False):
    # ``block``: None = inherit the config default (r4: block ON);
    # True/False = force.  Callers that do not forward it must inherit —
    # a False default would silently pin the classic pipeline on the
    # chain_no_*/decim subtractive variants while the ``chain``
    # reference ran block, corrupting every stage marginal.
    """Set the numeric-mode config for the duration of each call; jit
    traces on the first (warmup) call, baking the modes into the program."""
    from radiorust_tpu import config
    fn, spi = built
    if (prec == "highest" and not cmm and tile is None and block is None
            and factors is None and not s1rows):
        return fn, spi

    def wrapped(seed, iters):
        config.set_matmul_precision(prec)
        config.set_complex_mm_3mul(cmm or None)
        config.set_pallas_tile(tile)
        config.set_filter_blockmm(block)
        if factors:
            os.environ["RRTPU_FILTER_FACTORS"] = factors
        if s1rows:
            os.environ["RRTPU_FILTER_S1"] = "rows"
        try:
            return fn(seed, iters)
        finally:
            config.set_matmul_precision(None)
            config.set_complex_mm_3mul(None)
            config.set_pallas_tile(None)
            config.set_filter_blockmm(None)
            os.environ.pop("RRTPU_FILTER_FACTORS", None)
            os.environ.pop("RRTPU_FILTER_S1", None)

    return wrapped, spi


def parse(v):
    parts = v.split(":")
    name, opts = parts[0], parts[1:]
    tile = 8
    chain_tile = None       # whole-chain kernels keep defaults unless set
    prec = "highest"
    cmm = "3mul" in opts
    block = (True if "block" in opts
             else False if "cmm" in opts else None)
    factors = None
    for o in opts:
        if o.startswith("tile"):
            tile = int(o[4:])
            chain_tile = tile
        elif o in ("high", "highest", "default"):
            prec = o
        elif o == "s1rows":
            pass                        # handled below
        elif o.startswith("f") and "x" in o:
            factors = o[1:]             # e.g. f128x96 -> "128x96"
    if factors:
        # Build under the factor override too: the response grids are
        # shaped [n1, n2] at build time and must match the trace-time plan.
        os.environ["RRTPU_FILTER_FACTORS"] = factors
    try:
        return _parse_named(name, opts, tile, chain_tile, prec, cmm, block,
                            factors)
    finally:
        os.environ.pop("RRTPU_FILTER_FACTORS", None)


def _parse_named(name, opts, tile, chain_tile, prec, cmm, block, factors):
    if "s1rows" in opts and name != "filter1":
        # Only the standalone filter builder threads the orientation flag
        # through; silently ignoring it would mislabel an A/B run.
        raise SystemExit(f"s1rows is only supported with the filter1 "
                         f"variant, not {name!r}")
    if (any(o.startswith("drop") for o in opts)
            and not (name.startswith("geom")
                     and not name.startswith("geommid"))):
        # Same mislabeling hazard: only the plain geom builder threads
        # dropK through.
        raise SystemExit(f"dropK is only supported with plain geomN "
                         f"variants, not {name!r}")
    if name.startswith("geommid"):
        # geommidCHUNK: like geomCHUNK but with the merged
        # filter+demod+filter kernel (fuse_mid) — re-tests the r2 "3%
        # slower" verdict at the decoupled geometry.
        return _with_modes(build_chain(True, mid=True,
                                       n_in=int(name[7:]), ir_len=6144),
                           prec, cmm, chain_tile, block, factors)
    if name.startswith("geom"):
        # geomCHUNK[:dropK]: full fused chain at input chunk CHUNK, IRs
        # at 6144; dropK removes spec K (subtractive stage marginals at
        # the decoupled geometry — fused chain specs: 0 MixerDecimator,
        # 1 Filter, 2 FmDemodFilter, 3 Downsampler, 4 Gain).
        drop = tuple(int(o[4:]) for o in opts if o.startswith("drop"))
        return _with_modes(build_chain(True, n_in=int(name[4:]),
                                       ir_len=6144, drop=drop),
                           prec, cmm, chain_tile, block, factors)
    if name.startswith("filter1g"):
        # filter1gX: standalone decoupled kernel, X new samples/step.
        return _with_modes(build_filter1_geom(int(name[8:]), tile, prec),
                           prec, cmm, None, block, factors)
    if name == "chain":
        return _with_modes(build_chain(True), prec, cmm, chain_tile, block,
                           factors)
    if name == "chain_mid":
        return _with_modes(build_chain(True, mid=True), prec, cmm,
                           chain_tile, block, factors)
    # The subtractive variants MUST carry the same numeric-mode options
    # as the ``chain`` reference they are subtracted from — a dropped
    # option silently mixes pipelines and corrupts every stage marginal.
    if name == "chain_no_filter1":
        return _with_modes(build_chain(True, drop=(1,)), prec, cmm,
                           chain_tile, block, factors)
    if name == "chain_no_tail":
        return _with_modes(build_chain(True, drop=(3,)), prec, cmm,
                           chain_tile, block, factors)
    if name == "chain_no_demod":
        # NB: approximate — without demod the tail sees a complex stream
        # (two conv planes instead of one), overcounting the tail.
        return _with_modes(build_chain(True, drop=(2,)), prec, cmm,
                           chain_tile, block, factors)
    if name == "chain_tail_xla":
        return build_chain(True, tail_pallas=False)
    if name == "chain_unfused":
        return build_chain(False)
    if name == "frontend":
        return build_frontend()
    if name.startswith("frontendg"):
        # frontendgCHUNK: the fused mixer+decimator alone at input chunk
        # CHUNK (the decoupled chain's front end).
        return build_frontend(n_in=int(name[9:]))
    if name.startswith("decimg"):
        # decimgCHUNK: the decimator alone (no mixer) at input chunk
        # CHUNK — the frontend-minus-mix baseline.
        return build_frontend("decim", n_in=int(name[6:]))
    if name.startswith("mixerg"):
        return build_frontend("mixer", n_in=int(name[6:]))
    if name == "mixer":
        return build_frontend("mixer")
    if name == "decim":
        return _with_modes(build_frontend("decim"), prec, cmm,
                           block=block, factors=factors)
    if name == "feedback":
        return build_feedback(tile if tile > 128 else N_IN)
    if name == "filter1":
        return _with_modes(build_filter1(tile, prec), prec, cmm,
                           block=block, factors=factors,
                           s1rows="s1rows" in opts)
    if name == "filter1_xla":
        return build_filter1_xla()
    if name == "demod":
        return _with_modes(build_demod(tile, prec), prec, cmm, block=block,
                           factors=factors)
    if name == "tail":
        return build_tail()
    if name == "tail_xla":
        return build_tail(pallas=False)
    raise SystemExit(f"unknown variant {name}")


def main():
    variants = sys.argv[1:]
    if not variants:
        raise SystemExit(__doc__)
    # The relay adds a FIXED ~31 ms dispatch+fetch cost per timed call
    # (measured: the identity `feedback` variant at 256 iters reads as
    # ~123 us/step at every width).  Amortize it: >= 2048 steps per call
    # keeps the bias under ~8%, 8192 under 2%.
    iters = int(os.environ.get("EXP_ITERS", "4096"))
    built = [(v, *parse(v)) for v in variants]

    # Warm up (compile) every program before timing any; the first fetch
    # also pays the relay warmup.  One failing variant must not kill the
    # batch (compiles are expensive through the relay).
    ok = []
    for v, fn, spi in built:
        t0 = time.perf_counter()
        try:
            val = float(fn(0, 2))
            assert np.isfinite(val), f"{v}: non-finite warmup checksum"
        except Exception as e:
            print(f"# FAILED {v}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        dt = time.perf_counter() - t0
        print(f"# warm {v}: {dt:.1f}s", flush=True)
        ok.append((v, fn, spi))

    results = {}
    for v, fn, samples_per_iter in ok:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            val = float(fn(0, iters))
            dt = time.perf_counter() - t0
            assert np.isfinite(val), f"{v}: non-finite checksum"
            best = min(best, dt)
        us_per_iter = best / iters * 1e6
        results[v] = round(us_per_iter, 1)
        print(json.dumps({
            "variant": v,
            "us_per_step": round(us_per_iter, 1),
            "msps_equiv": round(samples_per_iter / (best / iters) / 1e6, 1),
        }), flush=True)

    print("# summary:", json.dumps(results))


if __name__ == "__main__":
    main()
