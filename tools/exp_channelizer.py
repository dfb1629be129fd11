#!/usr/bin/env python
"""Channelized-receiver stage A/B on the real chip (same discipline as
exp_filter.py: one process, >=4096 steps per timed call, scalar-fetch
sync).

Variants:
  chan        Channelizer block alone
  full        channelizer + per-channel FmDemod + gain (the bench chain)
  full_poly   same with the polynomial atan2 (RRTPU_ATAN2=poly)
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

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc
    _cc.set_cache_dir(os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

from radiorust_tpu import config
from radiorust_tpu.blocks.base import (Chain, StreamSig, pack_wire,
                                       unpack_wire)
from radiorust_tpu.blocks.channelize import Channelizer

BATCH = 4
N = 65536
RATE = 16384000.0
T = 8


def build(which):
    from radiorust_tpu.models.channelizer import channelized_receiver
    if which == "chan":
        chain = Chain(Channelizer(64, 8))
    elif which == "fused":
        chain = channelized_receiver(num_channels=64, input_rate=RATE,
                                     fuse=True)
    else:
        chain = channelized_receiver(num_channels=64, input_rate=RATE)
    poly = which == "full_poly"
    config.set_atan2_poly(poly or None)
    try:
        bound = chain.bind(StreamSig(BATCH, N, RATE))

        @jax.jit
        def bench(pp, ps, seed, reps):
            params = unpack_wire(pp)
            state = unpack_wire(ps)
            key = jax.random.key(seed)
            a = jax.random.normal(key, (T, BATCH, N), jnp.float32)
            b = jax.random.normal(jax.random.fold_in(key, 1),
                                  (T, BATCH, N), jnp.float32)
            xs = jax.lax.complex(a, b)
            reset = jnp.zeros((BATCH,), bool)

            def sb(st, x):
                st, y = bound.process(params, st, x, reset)
                return st, jnp.sum(jnp.abs(y) ** 2)

            def rb(i, carry):
                st, acc = carry
                st, sums = jax.lax.scan(sb, st, xs)
                return st, acc + jnp.sum(sums)

            _, acc = jax.lax.fori_loop(0, reps, rb,
                                       (state, jnp.float32(0.0)))
            return acc

        pp = pack_wire(bound.params)
        ps = pack_wire(bound.init_state())
    finally:
        config.set_atan2_poly(None)

    def run(reps):
        config.set_atan2_poly(poly or None)
        try:
            return float(bench(pp, ps, 0, reps))
        finally:
            config.set_atan2_poly(None)

    return run


def main():
    variants = sys.argv[1:] or ["chan", "full", "full_poly"]
    reps = int(os.environ.get("EXP_REPS", "4096"))
    built = []
    for v in variants:
        fn = build(v)
        t0 = time.perf_counter()
        warm = fn(1)
        assert np.isfinite(warm) and warm > 0.0, f"{v}: bad warmup"
        print(f"# warm {v}: {time.perf_counter() - t0:.1f}s", flush=True)
        built.append((v, fn))
    for v, fn in built:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            val = fn(reps)
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(val) and val > 0.0
        us = best / (T * reps) * 1e6
        print(json.dumps({"variant": v, "us_per_step": round(us, 1),
                          "msps": round(BATCH * N / (best / (T * reps))
                                        / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
