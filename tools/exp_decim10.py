#!/usr/bin/env python
"""A/B the generalized (super-row) Pallas decimator against XLA's
strided conv for the bw_meter 10:1 front end — p=10 was unsupported by
the lane-aligned banded GEMM until the lcm(p,128) super-row layout.

One session, amortized dispatch, f32-scalar-fetch sync (CLAUDE.md).

    python tools/exp_decim10.py
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

from radiorust_tpu.blocks.base import Chain, StreamSig, pack_wire, unpack_wire
from radiorust_tpu.models.bandwidth_meter import bandwidth_meter_chain
from radiorust_tpu.blocks.resampling import Downsampler
from radiorust_tpu.blocks.transform import FreqShifter

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
N, RATE = 10240, 1024000.0
T = int(os.environ.get("BENCH_T", "8"))
REPS = int(os.environ.get("BENCH_REPS", "128"))


def build(name):
    if name.startswith("frontend"):
        chain = Chain(FreqShifter.with_shift(100.0),
                      Downsampler(102400.0, 50000.0))
    else:
        chain = bandwidth_meter_chain()
    bound = chain.bind(StreamSig(BATCH, N, RATE))
    if name.endswith("xla"):
        for blk in bound.blocks:
            if type(blk).__name__ == "_BoundResampler":
                blk._use_pallas = lambda: False

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
    names = ["frontend_xla", "frontend_pallas", "bwmeter_xla",
             "bwmeter_pallas"]
    built = []
    for name in names:
        bench, pp, ps = build(name)
        warm = float(bench(pp, ps, 0, 1))
        assert np.isfinite(warm) and warm > 0.0, (name, warm)
        print(f"# warm {name}", flush=True)
        built.append((name, bench, pp, ps))
    for name, bench, pp, ps in built:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(bench(pp, ps, 0, REPS))
            dt = time.perf_counter() - t0
            assert np.isfinite(v) and v > 0.0
            best = min(best, dt)
        us = best / (T * REPS) * 1e6
        msps = BATCH * N / us
        print(json.dumps({"config": name, "us_per_step": round(us, 1),
                          "msps": round(msps, 1)}), flush=True)


if __name__ == "__main__":
    main()
