#!/usr/bin/env python
"""A/B the MXU matmul prefix sum (ops/cumsum.py) against jnp.cumsum's
native shift-ladder lowering in the three long-axis scan sites: FmMod's
phase integrator (isolated + full morse_rf chain) and the bw_meter
occupied-bandwidth walk.

One session, amortized dispatch, f32-scalar-fetch sync (CLAUDE.md).

    python tools/exp_fmmod.py
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

from radiorust_tpu import config
from radiorust_tpu.blocks.base import Chain, StreamSig, pack_wire, unpack_wire
from radiorust_tpu.blocks.modulation import FmMod

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
T = int(os.environ.get("BENCH_T", "16"))
REPS = int(os.environ.get("BENCH_REPS", "256"))


def build(kind):
    if kind == "fmmod":
        chain, n, rate = Chain(FmMod(2500.0)), 4096, 128000.0
    elif kind == "morse_rf":
        from radiorust_tpu.models.morse_tx import morse_rf_chain
        chain, n, rate = morse_rf_chain(), 4096, 128000.0
    else:  # bwmeter
        from radiorust_tpu.models.bandwidth_meter import bandwidth_meter_chain
        chain, n, rate = bandwidth_meter_chain(), 10240, 1024000.0
    bound = chain.bind(StreamSig(BATCH, n, rate))

    @jax.jit
    def bench(pp, ps, seed, reps):
        params = unpack_wire(pp)
        state = unpack_wire(ps)
        key = jax.random.key(seed)
        a = jax.random.normal(key, (T, BATCH, n), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(key, 1), (T, BATCH, n),
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

    return bench, pack_wire(bound.params), pack_wire(bound.init_state()), n


def main():
    cases = [(kind, mode) for kind in ("fmmod", "morse_rf", "bwmeter")
             for mode in ("xla", "matmul")]
    built = []
    warms = []
    try:
        # Build + dispatch every warm-up BEFORE the first device->host
        # fetch (CLAUDE.md rule 4: fetches degrade later puts).  The warm
        # call traces under `mode`; its result stays on-device for now.
        for kind, mode in cases:
            config.set_cumsum_mode(mode)
            bench, pp, ps, n = build(kind)
            warms.append(bench(pp, ps, 0, 1))
            print(f"# dispatched warm {kind}:{mode}", flush=True)
            built.append((kind, mode, bench, pp, ps, n))
    finally:
        config.set_cumsum_mode(None)
    for (kind, mode, *_), w in zip(built, warms):
        warm = float(w)
        assert np.isfinite(warm) and warm > 0.0, (kind, mode, warm)
    for kind, mode, bench, pp, ps, n in built:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(bench(pp, ps, 0, REPS))
            dt = time.perf_counter() - t0
            assert np.isfinite(v) and v > 0.0
            best = min(best, dt)
        us = best / (T * REPS) * 1e6
        msps = BATCH * n / us
        print(json.dumps({"config": f"{kind}:{mode}",
                          "us_per_step": round(us, 1),
                          "msps": round(msps, 1)}), flush=True)


if __name__ == "__main__":
    main()
