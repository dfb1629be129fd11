#!/usr/bin/env python
"""A/B the per-sample feedback recurrences (SlewRateLimiter / AgcControl)
across formulations — the morse BASELINE config's bottleneck
(docs/PERF.md round 2: 664 Msps, slew-dominated):

  slew: xla_div    lax.scan, sqrt + divide (round-2 shipping form)
        xla_rsqrt  lax.scan, squared-norm compare + one rsqrt
        pl_div     Pallas in-kernel sample loop, sqrt + divide
        pl_rsqrt   Pallas in-kernel sample loop, rsqrt
  agc:  xla_seq    lax.scan feedback loop (round-2 shipping form)
        pl_seq     Pallas in-kernel sample loop
        assoc      exact clamped-affine associative_scan (log depth)

All variants are built and warmed in ONE process (relay throughput varies
+-30% across processes); timing closes with an f32 scalar fetch reduced
over every output; T x reps >= 1024 chunk-steps per call amortizes the
relay's fixed ~31 ms dispatch cost (CLAUDE.md).

    python tools/exp_scan.py              # on the TPU machine
    JAX_PLATFORMS=cpu python tools/exp_scan.py   # CPU smoke
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from radiorust_tpu.blocks.transform import _agc_compose, _agc_elems
from radiorust_tpu.ops import pallas_scan

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
N = int(os.environ.get("BENCH_N", "4096"))
T = int(os.environ.get("BENCH_T", "8"))
REPS = int(os.environ.get("BENCH_REPS", "128"))

MD = np.float32(100.0 / 48000.0)   # morse_audio_chain slew per-sample step
RATE, REF, MAXG = np.float32(5e-3), np.float32(1.0), np.float32(100.0)


# --- slew variants: (prev_r, prev_i), x chunk [B, n] -> state, y ----------

def slew_xla(rsqrt):
    def chunk(st, xr, xi):
        def step(prev, s):
            pr, pi = prev
            dr, di = s[0] - pr, s[1] - pi
            if rsqrt:
                n2 = dr * dr + di * di
                scale = jnp.where(n2 > MD * MD, MD * jax.lax.rsqrt(n2),
                                  jnp.float32(1.0))
            else:
                norm = jnp.sqrt(dr * dr + di * di)
                scale = jnp.where(norm > MD, MD / norm, jnp.float32(1.0))
            pr, pi = pr + dr * scale, pi + di * scale
            return (pr, pi), (pr, pi)

        xs = jnp.stack([xr, xi], 0)                   # [2, B, n]
        st, ys = jax.lax.scan(step, st, jnp.moveaxis(xs, -1, 0), unroll=8)
        return st, jnp.moveaxis(jnp.stack(ys, 0), 0, -1)
    return chunk


def slew_pl(rsqrt):
    def chunk(st, xr, xi):
        yr, yi, pr, pi = pallas_scan.slew_scan(xr, xi, st[0], st[1], MD,
                                               rsqrt=rsqrt)
        return (pr, pi), jnp.stack([yr, yi], 0)
    return chunk


# --- agc variants: gain [B], x chunk -> state, y --------------------------

def agc_xla(st, xr, xi):
    def step(g, s):
        yr, yi = s[0] * g, s[1] * g
        g = g + RATE * (REF - jnp.sqrt(yr * yr + yi * yi))
        return jnp.clip(g, 0.0, MAXG), (yr, yi)

    xs = jnp.stack([xr, xi], 0)
    g, ys = jax.lax.scan(step, st, jnp.moveaxis(xs, -1, 0), unroll=8)
    return g, jnp.moveaxis(jnp.stack([ys[0], ys[1]], 0), 0, -1)


def agc_pl(st, xr, xi):
    yr, yi, g = pallas_scan.agc_scan(xr, xi, st, RATE, REF, MAXG)
    return g, jnp.stack([yr, yi], 0)


def agc_assoc(st, xr, xi):
    params = {"rate": RATE, "reference": REF, "max_gain": MAXG}
    elems = _agc_elems(params, jax.lax.complex(xr, xi))
    pa, pb, plo, phi = jax.lax.associative_scan(_agc_compose, elems,
                                                axis=-1)
    g_inc = jnp.clip(pa * st[:, None] + pb, plo, phi)
    g_exc = jnp.concatenate([st[:, None], g_inc[:, :-1]], axis=-1)
    return g_inc[:, -1], jnp.stack([xr * g_exc, xi * g_exc], 0)


def build(chunk_fn, state0):
    @jax.jit
    def bench(seed, reps):
        key = jax.random.key(seed)
        a = jax.random.normal(key, (T, BATCH, N), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(key, 1), (T, BATCH, N),
                              jnp.float32)

        def sb(st, ab):
            st, y = chunk_fn(st, ab[0], ab[1])
            return st, jnp.sum(y * y)

        def rb(i, carry):
            st, acc = carry
            st, sums = jax.lax.scan(sb, st, jnp.stack([a, b], 1))
            return st, acc + jnp.sum(sums)

        _, acc = jax.lax.fori_loop(0, reps, rb, (state0, jnp.float32(0.0)))
        return acc

    return bench


def main():
    z = jnp.zeros((BATCH,), jnp.float32)
    variants = [
        ("slew_xla_div", build(slew_xla(False), (z, z))),
        ("slew_xla_rsqrt", build(slew_xla(True), (z, z))),
        ("slew_pl_div", build(slew_pl(False), (z, z))),
        ("slew_pl_rsqrt", build(slew_pl(True), (z, z))),
        ("agc_xla_seq", build(agc_xla, jnp.ones((BATCH,), jnp.float32))),
        ("agc_pl_seq", build(agc_pl, jnp.ones((BATCH,), jnp.float32))),
        ("agc_assoc", build(agc_assoc, jnp.ones((BATCH,), jnp.float32))),
    ]
    only = sys.argv[1:]
    if only:
        variants = [(n, b) for n, b in variants
                    if any(s in n for s in only)]

    for name, bench in variants:
        t0 = time.perf_counter()
        warm = float(bench(0, 1))
        assert np.isfinite(warm) and warm > 0.0, (name, warm)
        print(f"# warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    for name, bench in variants:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(bench(0, REPS))
            dt = time.perf_counter() - t0
            assert np.isfinite(v) and v > 0.0
            best = min(best, dt)
        msps = BATCH * N * T * REPS / best / 1e6
        us = best / (T * REPS) * 1e6
        print(json.dumps({"config": name, "msps": round(msps, 1),
                          "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    main()
