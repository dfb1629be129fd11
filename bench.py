#!/usr/bin/env python
"""Benchmark: WFM receive chain throughput on one TPU chip.

Metric: complex IQ input Msamples/s through the full
shift -> decimate -> filter -> FM demod -> deemphasis -> decimate -> gain
chain (BASELINE.md).  ``vs_baseline`` compares against the *pipelined* CPU
reference rate (one core per block, bounded by the slowest stage — the
most favorable reading of the reference's Tokio task-per-block runtime),
measured by the native C++ per-sample implementation in
``native/baseline/wfm_baseline.cpp`` and cached in BASELINE_MEASURED.json.

Prints exactly one JSON line.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_FILE = REPO / "BASELINE_MEASURED.json"


def measure_cpu_baseline():
    src = REPO / "native" / "baseline" / "wfm_baseline.cpp"
    exe = REPO / "native" / "baseline" / "wfm_baseline"
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-o", str(exe),
             str(src), "-lm"], check=True)
    out = subprocess.run([str(exe), "192"], check=True,
                         capture_output=True, text=True).stdout
    data = json.loads(out.strip().splitlines()[-1])
    BASELINE_FILE.write_text(json.dumps(data, indent=1))
    return data


def get_cpu_baseline():
    if BASELINE_FILE.exists():
        try:
            return json.loads(BASELINE_FILE.read_text())
        except json.JSONDecodeError:
            pass
    return measure_cpu_baseline()


def main():
    baseline = get_cpu_baseline()
    baseline_msps = float(baseline["pipelined_msps"])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radiorust_tpu.blocks.base import StreamSig
    from radiorust_tpu.models.wfm import (WFM_INPUT_CHUNK, WFM_INPUT_RATE,
                                          wfm_receiver)

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    sig = StreamSig(batch, WFM_INPUT_CHUNK, WFM_INPUT_RATE)
    bound = wfm_receiver().bind(sig)

    @jax.jit
    def step(params, state, x):
        reset = jnp.zeros((batch,), bool)
        return bound.process(params, state, x, reset)

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((batch, WFM_INPUT_CHUNK))
                     + 1j * rng.standard_normal((batch, WFM_INPUT_CHUNK))
                     ).astype(np.complex64))
    params = bound.params
    state = bound.init_state()

    # Warmup / compile.
    state, y = step(params, state, x)
    jax.block_until_ready(y)

    iters = int(os.environ.get("BENCH_ITERS", "50"))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, y = step(params, state, x)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)

    samples = batch * WFM_INPUT_CHUNK * iters
    msps = samples / best / 1e6
    print(json.dumps({
        "metric": "wfm_chain_input_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
    }))


if __name__ == "__main__":
    main()
