#!/usr/bin/env python
"""Marginal cost of the on-device occupied-bandwidth metering
(metering.bandwidth_jax) on top of the bw_meter spectrum chain — one
session, subtractive A/B (same discipline as exp_bwmeter)."""

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

from radiorust_tpu.blocks.base import StreamSig, pack_wire, unpack_wire
from radiorust_tpu.models.bandwidth_meter import (bandwidth_meter_chain,
                                                  measure_bandwidth)

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
N, RATE = 10240, 1024000.0
T = int(os.environ.get("BENCH_T", "8"))
REPS = int(os.environ.get("BENCH_REPS", "128"))


def build(with_post):
    bound = bandwidth_meter_chain().bind(StreamSig(BATCH, N, RATE))

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
            acc = jnp.sum(jnp.abs(y) ** 2)
            if with_post:
                acc = acc + jnp.sum(measure_bandwidth(
                    y, bound.out_sig.sample_rate))
            return st, acc

        def rb(i, carry):
            st, acc = carry
            st, sums = jax.lax.scan(sb, st, xs)
            return st, acc + jnp.sum(sums)

        _, acc = jax.lax.fori_loop(0, reps, rb, (state, jnp.float32(0.0)))
        return acc

    return bench, pack_wire(bound.params), pack_wire(bound.init_state())


def main():
    built = []
    for name, wp in (("chain_only", False), ("chain_plus_metering", True)):
        bench, pp, ps = build(wp)
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
        print(json.dumps({"config": name, "us_per_step": round(us, 1),
                          "marginal_us": round(us - prev, 1)}), flush=True)
        prev = us


if __name__ == "__main__":
    main()
