#!/usr/bin/env python
"""End-to-end device validation for EVERY model: each TPU-compiled chain
must match the CPU-compiled chain (the reference formulation, Pallas in
interpret mode) on identical inputs.

Inputs are generated on-device deterministically — jax.random (threefry)
is bit-identical across backends, and the synthetic program signals use
only arange/trig — so both sides compute from the same samples; we
compare per-chunk output energy / real-sum / imag-sum checksums.

Models: wfm, wfm_fused, wfm_wide (the r5 decoupled-geometry flagship),
stereo, channelizer, channelizer_fused, am, ssb,
morse, morse_rf, bw_meter, audiopipe, wfm_tx, isb (VERDICT r2 item 4: the
backend's bf16/precision quirks make "CPU-equal" a per-model question,
not a given; r3 item 1: bw_meter's single-scan bandwidth walk and FmMod's
MXU prefix-sum integrator were rewritten and must be twinned on-chip —
bw_meter compares the *bandwidth values in hertz* plus spectrum checksums).

Run on the TPU machine:
    python tools/validate_tpu.py              # all models
    python tools/validate_tpu.py wfm stereo   # subset
Exits nonzero on any mismatch beyond the per-model f32 tolerance.
"""

import json
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PROGRAM = r"""
import os
import numpy as np, jax, jax.numpy as jnp
from radiorust_tpu.blocks.base import StreamSig, pack_wire, unpack_wire

MODEL = os.environ["VALIDATE_MODEL"]
T = 4


def fm_tone(batch, n, rate, deviation=150000.0, audio=1000.0):
    # Deterministic FM-modulated tone with a CLOSED-FORM phase integral:
    # theta(t) = 2 pi dev int 0.3 sin(2 pi fa t) dt
    #          = 0.3 dev (1 - cos(2 pi fa t)) / fa   (bounded, no cumsum).
    # A cumsum here would be a backend-dependent reduction order — the
    # two sides would demodulate *different* f32 signals.
    t = jnp.arange(T * n, dtype=jnp.float32) / np.float32(rate)
    theta = (np.float32(0.3 * deviation / audio)
             * (1.0 - jnp.cos(2 * np.pi * np.float32(audio) * t)))
    iq = jnp.exp(1j * theta.astype(jnp.complex64))
    ph = jnp.exp(1j * jnp.linspace(0.0, 1.0, batch).astype(jnp.complex64))
    return (iq[None, :] * ph[:, None]).reshape(batch, T, -1).swapaxes(0, 1)


def noise(batch, n, seed=0):
    key = jax.random.key(seed)
    a = jax.random.normal(key, (T, batch, n), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (T, batch, n),
                          jnp.float32)
    return jax.lax.complex(a, b)


def keyed_envelope(batch, n, period=1536):
    t = jnp.arange(T * n, dtype=jnp.float32)
    key_env = ((t // period) % 2).astype(jnp.float32)  # on/off keying
    amp = jnp.linspace(0.6, 1.0, batch).astype(jnp.float32)
    x = (amp[:, None] * key_env[None, :]).astype(jnp.complex64)
    return x.reshape(batch, T, -1).swapaxes(0, 1)


def build():
    # Returns (bound, gen, is_graph, post).  post(y, bound) maps the
    # chain output to extra leaves to checksum (e.g. metering values in
    # hertz); None means checksum the output itself only.
    if MODEL in ("wfm", "wfm_fused"):
        from radiorust_tpu.models.wfm import (WFM_INPUT_CHUNK,
                                              WFM_INPUT_RATE, wfm_receiver)
        f = MODEL.endswith("fused")
        batch, n = 8, WFM_INPUT_CHUNK
        bound = wfm_receiver(fuse_frontend=f, fuse_demod=f).bind(
            StreamSig(batch, n, WFM_INPUT_RATE))
        return bound, (lambda: noise(batch, n)), False, None
    if MODEL == "wfm_wide":
        # The r5 flagship geometry: chunk 24576 with the filter IRs held
        # at the reference's 6144-tap design (decoupled overlap-save —
        # the hp != n1/2 transform split on-chip, bench.py's default).
        from radiorust_tpu.models.wfm import WFM_INPUT_RATE, wfm_receiver
        batch, n = 8, 24576
        bound = wfm_receiver(fuse_frontend=True, fuse_demod=True,
                             filter_ir_len=6144).bind(
            StreamSig(batch, n, WFM_INPUT_RATE))
        return bound, (lambda: noise(batch, n)), False, None
    if MODEL in ("stereo", "stereo_wide"):
        # _wide: the r5 decoupled geometry on the full stereo DAG — the
        # fused filter-BANK kernel at the hp != n1/2 transform split.
        from radiorust_tpu.models.stereo import wfm_stereo_receiver
        from radiorust_tpu.models.wfm import (WFM_INPUT_CHUNK,
                                              WFM_INPUT_RATE)
        wide = MODEL.endswith("wide")
        batch, n = 4, (24576 if wide else WFM_INPUT_CHUNK)
        bound = wfm_stereo_receiver(
            filter_ir_len=6144 if wide else None).bind(
            {"iq": StreamSig(batch, n, WFM_INPUT_RATE)})

        def gen():
            # Proper stereo MPX (mono + 19 kHz pilot + 38 kHz DSB-SC),
            # FM-modulated with a CLOSED-FORM phase integral (each MPX
            # component is a sinusoid, so the integral is a cosine sum —
            # no cumsum).  The pilot must be present: an empty pilot
            # band makes the decoder's phase-doubling normalize a
            # near-zero vector and ulps blow up to O(1).
            rate, dev = WFM_INPUT_RATE, 150000.0
            t = jnp.arange(T * n, dtype=jnp.float32) / np.float32(rate)
            comps = ((0.45, 1000.0), (0.1, 19000.0),
                     (0.225, 39200.0), (-0.225, 36800.0))
            theta = jnp.zeros_like(t)
            for amp, f in comps:
                theta = theta + (np.float32(amp * dev / f)
                                 * (1.0 - jnp.cos(2 * np.pi
                                                  * np.float32(f) * t)))
            iq = jnp.exp(1j * theta.astype(jnp.complex64))
            ph = jnp.exp(1j * jnp.linspace(0.0, 1.0, batch)
                         .astype(jnp.complex64))
            return (iq[None, :] * ph[:, None]).reshape(
                batch, T, -1).swapaxes(0, 1)

        return bound, gen, True, None
    if MODEL in ("channelizer", "channelizer_fused"):
        from radiorust_tpu.models.channelizer import channelized_receiver
        batch, n, rate = 2, 65536, 16384000.0
        bound = channelized_receiver(fuse=MODEL.endswith("fused")).bind(
            StreamSig(batch, n, rate))

        def gen():
            # FM carriers on three channel centers.  Carrier phase is
            # EXACT integer math (channel k advances k/64 cycles per
            # sample; (idx*k) % 64 stays < 2^24 so f32 is exact) and the
            # modulation integral is closed-form — fully deterministic
            # and bounded on both backends, no cumsum, no large-argument
            # trig.
            ch = rate / 64.0
            idx = jnp.arange(T * n, dtype=jnp.int32)
            t = idx.astype(jnp.float32) / np.float32(rate)
            x = jnp.zeros((T * n,), jnp.complex64)
            # EVERY channel carries an FM tone: an empty channel's demod
            # is atan2 of filter-leakage noise — chaotic in ulps — and
            # would poison the cross-backend checksum.
            for k in range(64):
                audio = 300.0 + 23.0 * k
                carrier = ((idx * k) % 64).astype(jnp.float32) / 64.0
                dev = 0.25 * ch
                fm = (np.float32(0.3 * dev / audio)
                      * (1.0 - jnp.cos(2 * np.pi * np.float32(audio) * t)))
                th = 2 * np.pi * carrier + fm
                x = x + jnp.exp(1j * th.astype(jnp.complex64))
            ph = jnp.exp(1j * jnp.linspace(0.0, 0.5, batch)
                         .astype(jnp.complex64))
            return (x[None, :] * ph[:, None]).reshape(
                batch, T, -1).swapaxes(0, 1)

        return bound, gen, False, None
    if MODEL == "morse":
        # Covers the Pallas slew-scan kernel's on-chip numerics (the
        # rsqrt clamp): a keyed envelope drives the clamp through both
        # regimes (slew-limited edges, tracking plateaus).
        from radiorust_tpu.models.morse_tx import morse_audio_chain
        batch, n, rate = 4, 4096, 48000.0
        bound = morse_audio_chain().bind(StreamSig(batch, n, rate))
        return bound, (lambda: keyed_envelope(batch, n)), False, None
    if MODEL == "morse_rf":
        # FmMod on-chip: the r3 MXU triangular-matmul phase integrator
        # (ops/cumsum.py) modulating a keyed audio tone, with the carried
        # phase crossing chunk boundaries.  Covers the hi/lo bf16 split's
        # accumulation order on a real MXU vs CPU.
        from radiorust_tpu.models.morse_tx import morse_rf_chain
        batch, n, rate = 4, 4096, 128000.0
        bound = morse_rf_chain().bind(StreamSig(batch, n, rate))
        return bound, (lambda: keyed_envelope(batch, n)), False, None
    if MODEL == "bw_meter":
        # The r3 single-scan bandwidth walk (metering.py bandwidth_jax):
        # compare the bandwidth values IN HERTZ plus spectrum checksums.
        # The band must be POPULATED (tones at +5/-4 kHz inside the
        # +-25 kHz passband) — metering an empty band walks noise bins.
        from radiorust_tpu.models.bandwidth_meter import (
            bandwidth_meter_chain, measure_bandwidth)
        batch, n, rate = 4, 10240, 1024000.0
        bound = bandwidth_meter_chain().bind(StreamSig(batch, n, rate))

        def gen():
            # Carrier phases as EXACT integer math: k/1024 cycles/sample
            # -> k kHz at 1.024 Msps ((idx*k) % 1024 < 2^24, f32-exact).
            idx = jnp.arange(T * n, dtype=jnp.int32)
            t = idx.astype(jnp.float32) / np.float32(rate)
            x = jnp.zeros((T * n,), jnp.complex64)
            for k, audio, amp in ((5, 150.0, 1.0), (1024 - 4, 230.0, 0.7)):
                carrier = ((idx * k) % 1024).astype(jnp.float32) / 1024.0
                fm = (np.float32(0.3 * 1000.0 / audio)
                      * (1.0 - jnp.cos(2 * np.pi * np.float32(audio) * t)))
                th = 2 * np.pi * carrier + fm
                x = x + amp * jnp.exp(1j * th.astype(jnp.complex64))
            ph = jnp.exp(1j * jnp.linspace(0.0, 0.5, batch)
                         .astype(jnp.complex64))
            return (x[None, :] * ph[:, None]).reshape(
                batch, T, -1).swapaxes(0, 1)

        def post(y, bound):
            return [measure_bandwidth(y, bound.out_sig.sample_rate)]

        return bound, gen, False, post
    if MODEL == "audiopipe":
        # freq_shift -> lowpass Filter -> 2x Downsampler at 2.4 Msps
        # (BASELINE.json config 2) — fully linear, noise input is fine.
        from radiorust_tpu.blocks.base import Chain
        from radiorust_tpu.blocks.filters import Filter
        from radiorust_tpu.blocks.resampling import Downsampler
        from radiorust_tpu.blocks.transform import FreqShifter

        def lp(bins, freqs):
            return np.where(np.abs(freqs) <= 500000.0, 1.0 + 0.0j, 0.0j)

        chain = Chain(FreqShifter.with_shift(-100000.0), Filter.new(lp),
                      Downsampler(1200000.0, 1000000.0))
        batch, n = 4, 16384
        bound = chain.bind(StreamSig(batch, n, 2400000.0))
        return bound, (lambda: noise(batch, n)), False, None
    if MODEL == "wfm_tx":
        # Upsampler + FmMod on-chip: preemphasis -> 21.33x upsample ->
        # FM modulate a two-tone audio signal (exact integer phases:
        # 1 kHz = 1/48 cycles/sample, 3 kHz = 1/16, at 48 kHz).
        from radiorust_tpu.models.wfm import wfm_transmitter
        batch, n, rate = 4, 768, 48000.0
        bound = wfm_transmitter().bind(StreamSig(batch, n, rate))

        def gen():
            idx = jnp.arange(T * n, dtype=jnp.int32)
            a = (0.4 * jnp.sin(2 * np.pi * (idx % 48).astype(jnp.float32)
                               / 48.0)
                 + 0.2 * jnp.sin(2 * np.pi * (idx % 16).astype(jnp.float32)
                                 / 16.0))
            amp = jnp.linspace(0.6, 1.0, batch).astype(jnp.float32)
            x = (amp[:, None] * a[None, :]).astype(jnp.complex64)
            return x.reshape(batch, T, -1).swapaxes(0, 1)

        return bound, gen, False, None
    if MODEL in ("am", "ssb"):
        from radiorust_tpu.models.analog import (ANALOG_INPUT_CHUNK,
                                                 ANALOG_INPUT_RATE,
                                                 am_receiver, ssb_receiver)
        batch, n, rate = 4, ANALOG_INPUT_CHUNK, ANALOG_INPUT_RATE
        mk = am_receiver if MODEL == "am" else ssb_receiver
        bound = mk().bind(StreamSig(batch, n, rate))

        def gen():
            t = jnp.arange(T * n, dtype=jnp.float32) / np.float32(rate)
            a = jnp.sin(2 * np.pi * 1000.0 * t).astype(jnp.float32)
            if MODEL == "am":
                base = (1.0 + 0.5 * a).astype(jnp.complex64)
            else:  # USB: audio tone shifted up into the sideband
                base = jnp.exp(2j * np.pi * 1500.0
                               * t.astype(jnp.complex64))
            amp = jnp.linspace(0.5, 1.0, batch).astype(jnp.complex64)
            return (base[None, :] * amp[:, None]).reshape(
                batch, T, -1).swapaxes(0, 1)

        return bound, gen, False, None
    if MODEL == "isb":
        # The r4 fused filter-BANK kernel (one forward transform, K
        # response multiplies + inverses in VMEM) on a 2-band receiver:
        # independent programs on the upper and lower sidebands of one
        # suppressed carrier at DC.
        from radiorust_tpu.models.analog import (ANALOG_INPUT_CHUNK,
                                                 ANALOG_INPUT_RATE,
                                                 isb_receiver)
        batch, n, rate = 4, ANALOG_INPUT_CHUNK, ANALOG_INPUT_RATE
        bound = isb_receiver().bind({"iq": StreamSig(batch, n, rate)})

        def gen():
            t = jnp.arange(T * n, dtype=jnp.float32) / np.float32(rate)
            tc = t.astype(jnp.complex64)
            base = (0.5 * jnp.exp(2j * np.pi * 1000.0 * tc)     # USB 1 kHz
                    + 0.5 * jnp.exp(-2j * np.pi * 2000.0 * tc))  # LSB 2 kHz
            amp = jnp.linspace(0.5, 1.0, batch).astype(jnp.complex64)
            return (base[None, :] * amp[:, None]).reshape(
                batch, T, -1).swapaxes(0, 1)

        return bound, gen, True, None
    raise SystemExit(f"unknown model {MODEL}")


bound, gen, is_graph, post = build()
batch = next(iter([bound.in_sigs["iq"].batch])) if is_graph \
    else bound.in_sig.batch


@jax.jit
def run(pp, ps):
    params = unpack_wire(pp)
    state = unpack_wire(ps)
    xs = gen()

    def sb(st, x):
        if is_graph:
            st, y = bound.process(params, st, {"iq": x})
        else:
            st, y = bound.process(params, st, x,
                                  jnp.zeros((x.shape[0],), bool))
        leaves = jax.tree.leaves(y)
        if post is not None:
            leaves = leaves + jax.tree.leaves(post(y, bound))
        # Energy (strictly positive — no cancellation) plus a Rademacher
        # fingerprint: sum(y * w) with fixed +-1 weights from threefry
        # (bit-identical across backends).  |F| ~ sqrt(E*N), so the
        # comparator can normalize by the signal's natural scale — raw
        # re/im sums of tones cancel over whole periods and make
        # relative error meaningless.
        e = sum(jnp.sum(jnp.abs(l) ** 2) for l in leaves)
        cnt, fr, fi = 0.0, 0.0, 0.0
        for i, l in enumerate(leaves):
            w = jax.random.rademacher(
                jax.random.key(100 + i), l.shape).astype(jnp.float32)
            f = jnp.sum(l * w)
            fr = fr + jnp.real(f)
            fi = fi + jnp.imag(f)
            cnt += float(np.prod(l.shape))
        return st, (e, fr, fi, jnp.float32(cnt))

    _, sums = jax.lax.scan(sb, state, xs)
    return jnp.stack([sums[0], sums[1], sums[2], sums[3]])


out = np.asarray(run(pack_wire(bound.params), pack_wire(bound.init_state())))
print("CHECKSUMS", " ".join(f"{v:.8e}" for v in out.reshape(-1)))
"""

# Per-model steady-state tolerance: noise-driven FM demod is chaotic
# (ulps amplify through atan2), tone-driven chains are smooth.
#
# stereo/bw_meter budget ATTRIBUTION (VERDICT r4 item 3, measured r5):
# rerunning both twins under RRTPU_MATMUL_PRECISION=highest splits the
# precision mode from trajectory divergence —
#     stereo    4.415e-3 (high)  ->  3.08e-4 (highest)
#     bw_meter  6.869e-3 (high)  ->  1.96e-6 (highest)
# i.e. ~93% (stereo) / ~100% (bw_meter) of the bound is the documented
# bf16-hi/lo 3-pass decomposition of the 'high' matmul mode flowing
# through the stereo pilot normalization / the metering's in-hertz walk
# — NOT chaos.  Bounds are the high-mode measurement x ~1.4 headroom,
# no longer a 1e-2 blanket.
TOL = {"wfm": 2e-2, "wfm_fused": 2e-2, "wfm_wide": 2e-2, "stereo": 6e-3,
       "stereo_wide": 6e-3,
       "channelizer": 1e-2, "channelizer_fused": 1e-2,
       "am": 1e-3, "ssb": 1e-3, "morse": 1e-3,
       # morse_rf/wfm_tx: FmMod's carried phase accumulates cross-backend
       # scan-order ulps over chunks; bw_meter: see attribution above
       # (plus the documented 1-ulp walk-limit bin-flip caveat).
       "morse_rf": 1e-2, "bw_meter": 9e-3, "audiopipe": 1e-3,
       "wfm_tx": 1e-2, "isb": 1e-3}


def run_on(platform, model):
    import os
    env = dict(os.environ)
    env["VALIDATE_MODEL"] = model
    code = PROGRAM
    if platform == "cpu":
        # CPU: run fused kernels in pallas interpreter mode.
        code = ("import jax\njax.config.update('jax_platforms','cpu')\n"
                "import jax.experimental.pallas as _pl\n"
                "_orig=_pl.pallas_call\n"
                "_pl.pallas_call=lambda *a,**k:_orig(*a,**{**k,'interpret':True})\n"
                + code)
        env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env,
                       cwd=str(pathlib.Path(__file__).parents[1]))
    for line in r.stdout.splitlines():
        if line.startswith("CHECKSUMS"):
            return [float(v) for v in line.split()[1:]]
    raise RuntimeError(f"{platform}/{model} run failed:\n{r.stderr[-2000:]}")


def main():
    import numpy as np
    from bench import wait_for_backend
    models = sys.argv[1:] or list(TOL)
    wait_for_backend()     # ride out relay flaps (bounded retries)
    results, ok = {}, True
    for model in models:
        cpu = np.array(run_on("cpu", model)).reshape(4, -1)
        tpu = np.array(run_on("tpu", model)).reshape(4, -1)
        e_c, fr_c, fi_c, n_c = cpu
        e_t, fr_t, fi_t, _ = tpu
        # Energy: plain relative error.  Fingerprint: normalized by the
        # signal's natural scale sqrt(E*N) (|F| of a +-1-weighted sum is
        # a random walk of that magnitude — no cancellation blowup).
        scale = np.sqrt(np.maximum(e_c * n_c, 1e-12))
        rel = np.stack([
            np.abs(e_c - e_t) / np.maximum(e_c, 1e-9),
            np.abs(fr_c - fr_t) / scale,
            np.abs(fi_c - fi_t) / scale,
        ])
        # Chunk 0 is warmup (zero-primed filter tails, chaotic through
        # arctan2); steady-state chunks must agree within f32 tolerance.
        steady = float(rel[:, 1:].max())
        good = steady < TOL[model]
        ok &= good
        results[model] = round(steady, 8)
        print(f"{model}: max steady rel {steady:.3e} "
              f"({'OK' if good else 'FAIL'} @ {TOL[model]:g})", flush=True)
    print(json.dumps({"validate_tpu": results, "ok": ok}))
    if not ok:
        raise SystemExit("TPU/CPU mismatch beyond tolerance")
    print("OK: all models match CPU within f32 tolerance")


if __name__ == "__main__":
    main()
