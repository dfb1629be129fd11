#!/usr/bin/env python
"""Benchmark: WFM receive chain throughput on one TPU chip.

Metric: complex IQ input Msamples/s through the full
shift -> decimate -> filter -> FM demod -> deemphasis -> decimate -> gain
chain (BASELINE.md).  ``vs_baseline`` compares against the *pipelined* CPU
reference rate (one core per block, bounded by the slowest stage — the
most favorable reading of the reference's Tokio task-per-block runtime),
measured by the native C++ per-sample implementation in
``native/baseline/wfm_baseline.cpp`` and cached in BASELINE_MEASURED.json.

Measurement discipline (the TPU is reached through an experimental relay
backend where async dispatch can silently swallow failures):
- input data is generated on device inside the jitted program,
- the timed region runs T chunks x reps entirely inside one jit program,
- timing is closed by fetching an f32 scalar reduced over *every* output
  sample, so the measured time provably covers the full computation.

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

# Persistent XLA compilation cache: remote compiles through the TPU relay
# take minutes; a warm cache cuts a bench run from ~10 to ~3.5 minutes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / ".jax_cache"))

# Matmul numeric mode: 'high' = manual 3-pass bf16 decomposition, +28%
# chain throughput at 2.4e-5 max/rms transform error (HIGHEST: 6.9e-7),
# inside the ~1e-3 reference-parity bound (tools/probe_precision.py;
# validated end-to-end by tools/validate_tpu.py in this mode).
os.environ.setdefault("RRTPU_MATMUL_PRECISION", "high")


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


def wait_for_backend():
    """Wait out relay flaps before touching the backend in-process.

    The experimental relay backend intermittently reports UNAVAILABLE or
    hangs during init; JAX caches a failed platform init for the process
    lifetime, so the probe runs in fresh subprocesses and the main
    process only proceeds once a probe succeeds.  Bounded by a wall-clock
    deadline (BENCH_BACKEND_DEADLINE seconds, default 45 min): when the
    relay is down its failure mode is a *hang*, not an error, so
    proceeding would stall forever — fail fast with a clear message
    instead (override with BENCH_ALLOW_DEAD_BACKEND=1 to proceed anyway)."""
    # The sitecustomize pins jax to the TPU plugin programmatically, so a
    # CPU run must override via jax.config, not just the env var (same
    # dance as tests/conftest.py and the examples).
    probe = ("import os, jax\n"
             "if os.environ.get('JAX_PLATFORMS') == 'cpu':\n"
             "    jax.config.update('jax_platforms', 'cpu')\n"
             "jax.devices(); print('ok')")
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_BACKEND_DEADLINE", "2700"))
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True, timeout=150)
            if r.returncode == 0 and "ok" in r.stdout:
                return
            err = (r.stderr.strip().splitlines() or ["?"])[-1]
        except subprocess.TimeoutExpired:
            err = "probe timed out (relay hang)"
        if time.monotonic() >= deadline:
            if os.environ.get("BENCH_ALLOW_DEAD_BACKEND") == "1":
                sys.stderr.write("backend still down past deadline; "
                                 "proceeding anyway (override set)\n")
                return
            sys.stderr.write(
                f"backend unreachable past deadline (last: {err[:200]}); "
                "refusing to run — a dead relay hangs instead of erroring, "
                "and a hung benchmark records nothing useful\n")
            sys.exit(3)
        sys.stderr.write(f"backend probe {attempt} failed: "
                         f"{err[:200]}; retrying in 45 s\n")
        time.sleep(45)


def main():
    baseline = get_cpu_baseline()
    baseline_msps = float(baseline["pipelined_msps"])

    wait_for_backend()
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # Local smoke runs: honor the CPU override despite the
        # sitecustomize backend pin (see wait_for_backend).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    # Explicitly initialize the persistent compile cache (env-var-only
    # initialization is skipped for non-allowlisted backends like the
    # experimental relay platform).
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc)
        _cc.set_cache_dir(os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from radiorust_tpu.blocks.base import StreamSig, pack_wire, unpack_wire
    from radiorust_tpu.models.wfm import WFM_INPUT_RATE, wfm_receiver

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    T = int(os.environ.get("BENCH_T", "16"))
    # Input chunk length: the decoupled overlap-save geometry processes
    # more new samples per filter transform while keeping the reference's
    # designed 6144-tap responses (BENCH_IR) — same filtering, same
    # resolution, fewer FLOPs/sample and fuller MXU tiles.  Default 24576
    # (mid chunk 9216, 15360-pt transforms): +12% whole-chain over the
    # coupled 16384 geometry, tied with chunk 40960/49152 but smallest
    # buffers/latency (tools/exp_filter.py geomN A/B, r5).  BENCH_CHUNK=
    # 16384 reproduces the reference-coupled layout bit for bit.
    chunk = int(os.environ.get("BENCH_CHUNK", "24576"))
    ir_len = int(os.environ.get("BENCH_IR", "6144"))
    sig = StreamSig(batch, chunk, WFM_INPUT_RATE)
    fuse = os.environ.get("BENCH_FUSE_FRONTEND", "1") == "1"
    fuse_d = os.environ.get("BENCH_FUSE_DEMOD", "1") == "1"

    def build(f, fd):
        return wfm_receiver(fuse_frontend=f, fuse_demod=fd,
                            filter_ir_len=ir_len).bind(sig)

    bound = build(fuse, fuse_d)

    def make_bench(bound):
        @jax.jit
        def bench(pparams, pstate, seed, reps):
            # Complex leaves cross the boundary packed as f32 planes; the
            # PRNG key is built inside (key dtypes don't marshal on all
            # backends).
            params = unpack_wire(pparams)
            state = unpack_wire(pstate)
            key = jax.random.key(seed)
            a = jax.random.normal(key, (T, batch, chunk),
                                  jnp.float32)
            b = jax.random.normal(jax.random.fold_in(key, 1),
                                  (T, batch, chunk), jnp.float32)
            xs = jax.lax.complex(a, b)
            reset = jnp.zeros((batch,), bool)

            def scan_body(st, x):
                st, y = bound.process(params, st, x, reset)
                return st, jnp.sum(jnp.abs(y) ** 2)

            def rep_body(i, carry):
                st, acc = carry
                st, sums = jax.lax.scan(scan_body, st, xs)
                return st, acc + jnp.sum(sums)

            _, acc = jax.lax.fori_loop(
                0, reps, rep_body, (state, jnp.float32(0.0)))
            return acc

        return bench

    bench = make_bench(bound)
    pparams = pack_wire(bound.params)
    pstate = pack_wire(bound.init_state())
    # Warmup / compile; the float() fetch is the synchronization point and
    # also surfaces any silent runtime failure.  If the fused Pallas paths
    # fail on this backend, fall back to the plain chain — in a FRESH
    # process: a backend failure poisons every subsequent op in this one
    # (CLAUDE.md rules 2/8), so an in-process retry could publish garbage.
    try:
        warm = float(bench(pparams, pstate, 0, 1))
        assert np.isfinite(warm) and warm > 0.0
    except Exception:
        if not (fuse or fuse_d):
            raise
        sys.stderr.write("fused chain failed; rerunning unfused in a "
                         "fresh process\n")
        env = dict(os.environ,
                   BENCH_FUSE_FRONTEND="0", BENCH_FUSE_DEMOD="0")
        r = subprocess.run([sys.executable, __file__], env=env,
                           stdout=subprocess.PIPE, text=True)
        sys.stdout.write(r.stdout)
        sys.exit(r.returncode)

    # The relay adds a FIXED ~31 ms dispatch+fetch cost per timed call
    # (measured via an identity-loop variant in tools/exp_filter.py); at
    # T*reps = 256 steps that inflated every step by ~120 us and
    # under-reported throughput ~40%.  4096 steps/call keeps the bias <2%.
    reps = int(os.environ.get("BENCH_REPS", "256"))
    best = float("inf")
    # Cross-process throughput varies +-30% with relay load; take the best
    # of several in-process measurements.
    for _ in range(5):
        t0 = time.perf_counter()
        v = float(bench(pparams, pstate, 0, reps))
        dt = time.perf_counter() - t0
        assert np.isfinite(v) and v > 0.0, f"bad checksum {v}"
        best = min(best, dt)

    # Optional device trace for per-stage breakdown (TensorBoard/xprof).
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        from radiorust_tpu.utils.profiling import device_trace
        with device_trace(trace_dir):
            float(bench(pparams, pstate, 0, 1))

    samples = batch * chunk * T * reps
    msps = samples / best / 1e6
    record = {
        "metric": "wfm_chain_input_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
    }

    # MFU / roofline fields: FLOPs and HBM bytes per step come from XLA's
    # cost analysis of the same chain compiled on CPU (Pallas in interpret
    # mode — every matmul pass the MXU executes appears as a dot there;
    # tools/mfu.py).  Runs in a subprocess because this process is bound
    # to the TPU backend.
    try:
        # Pass the fuse knobs so mfu.py accounts the same chain variant
        # this process actually timed (incl. the unfused fallback).
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   BENCH_BATCH=str(batch),
                   BENCH_FUSE_FRONTEND="1" if fuse else "0",
                   BENCH_FUSE_DEMOD="1" if fuse_d else "0")
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "mfu.py"),
             "--json-only", "wfm"],
            env=env, capture_output=True, text=True, timeout=900)
        acct = json.loads(r.stdout.strip().splitlines()[-1])
        steps = T * reps
        achieved_tflops = acct["flops_per_step"] * steps / best / 1e12
        hbm_gbps = acct["hbm_bytes_per_step"] * steps / best / 1e9
        record.update({
            "flops_per_input_sample": round(
                acct["flops_per_input_sample"], 1),
            "achieved_tflops": round(achieved_tflops, 2),
            "mfu": round(achieved_tflops / acct["peak_bf16_tflops"], 4),
            "hbm_model_gbps": round(hbm_gbps, 1),
            "hbm_fraction": round(hbm_gbps / acct["peak_hbm_gbps"], 4),
        })
    except Exception as e:  # accounting is best-effort; never lose the bench
        sys.stderr.write(f"mfu accounting unavailable: {e}\n")

    print(json.dumps(record))


if __name__ == "__main__":
    main()
