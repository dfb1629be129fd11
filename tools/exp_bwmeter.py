#!/usr/bin/env python
"""Stage split of the bandwidth_meter config (the MFU outlier: 0.3%).

Cumulative-prefix chains timed in ONE session (subtractive marginals
cancel the relay's fixed dispatch cost); same measurement discipline as
bench.py (on-device input, T x reps in one program, f32 scalar fetch).

    python tools/exp_bwmeter.py
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("RRTPU_MATMUL_PRECISION", "high")

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from radiorust_tpu.blocks.analysis import Fourier
from radiorust_tpu.blocks.base import Chain, StreamSig, pack_wire, unpack_wire
from radiorust_tpu.blocks.chunks import Overlapper
from radiorust_tpu.blocks.filters import Filter
from radiorust_tpu.blocks.resampling import Downsampler
from radiorust_tpu.blocks.transform import FreqShifter
from radiorust_tpu.windowing import Kaiser

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
N, RATE = 10240, 1024000.0
T = int(os.environ.get("BENCH_T", "8"))
REPS = int(os.environ.get("BENCH_REPS", "128"))


def lp(bins, freqs):
    return np.where(np.abs(freqs) <= 25000.0, 1.0 + 0.0j, 0.0j)


PREFIXES = [
    ("shift", [FreqShifter.with_shift(100.0)]),
    ("+resample10x", [FreqShifter.with_shift(100.0),
                      Downsampler(102400.0, 50000.0)]),
    ("+filter", [FreqShifter.with_shift(100.0),
                 Downsampler(102400.0, 50000.0), Filter.new(lp)]),
    ("+overlap", [FreqShifter.with_shift(100.0),
                  Downsampler(102400.0, 50000.0), Filter.new(lp),
                  Overlapper(4)]),
    ("+fourier", [FreqShifter.with_shift(100.0),
                  Downsampler(102400.0, 50000.0), Filter.new(lp),
                  Overlapper(4),
                  Fourier.with_window(Kaiser.with_null_at_bin(4.0))]),
]


def build(blocks):
    bound = Chain(*blocks).bind(StreamSig(BATCH, N, RATE))

    @jax.jit
    def bench(pp, ps, seed, reps):
        params = unpack_wire(pp)
        state = unpack_wire(ps)
        key = jax.random.key(seed)
        a = jax.random.normal(key, (T, BATCH, N), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(key, 1), (T, BATCH, N),
                              jnp.float32)
        xs = jax.lax.complex(a, b)
        reset = jnp.zeros((BATCH,), bool)

        def sb(st, x):
            st, y = bound.process(params, st, x, reset)
            return st, jnp.sum(jnp.abs(y) ** 2)

        def rb(i, carry):
            st, acc = carry
            st, sums = jax.lax.scan(sb, st, xs)
            return st, acc + jnp.sum(sums)

        _, acc = jax.lax.fori_loop(0, reps, rb, (state, jnp.float32(0.0)))
        return acc

    return bench, pack_wire(bound.params), pack_wire(bound.init_state())


def main():
    built = []
    for name, blocks in PREFIXES:
        bench, pp, ps = build(blocks)
        warm = float(bench(pp, ps, 0, 1))
        assert np.isfinite(warm) and warm > 0.0, (name, warm)
        print(f"# warm {name}", flush=True)
        built.append((name, bench, pp, ps))
    prev = 0.0
    for name, bench, pp, ps in built:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(bench(pp, ps, 0, REPS))
            dt = time.perf_counter() - t0
            assert np.isfinite(v) and v > 0.0
            best = min(best, dt)
        us = best / (T * REPS) * 1e6
        print(json.dumps({"prefix": name, "us_per_step": round(us, 1),
                          "marginal_us": round(us - prev, 1)}), flush=True)
        prev = us


if __name__ == "__main__":
    main()
