#!/usr/bin/env python
"""On-chip proof of checkpoint-based worker recycling (RECYCLE_r05.json).

Serves an FM stream through the relay TPU across two worker generations
(``runtime/recycle.py``) and value-checks the stitched output against a
single-generation on-chip run.  Each generation is a fresh process, so
the relay client's per-process upload retention (docs/PERF.md soak
findings) resets at every recycle — the sustained-serving countermeasure,
demonstrated on the hardware it exists for.

Serialize with any other chip job (CLAUDE.md rule 10).  Run from the
repo root: ``python tools/recycle_onchip.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from radiorust_tpu.blocks.base import Chain
from radiorust_tpu.blocks.filters import Filter
from radiorust_tpu.blocks.modulation import FmDemod
from radiorust_tpu.blocks.transform import FreqShifter
from radiorust_tpu.runtime import serve_recycling

RATE = 256000.0
CHUNK = 2048
N_CHUNKS = 8
BUDGET = 4  # chunks per worker generation -> 2 generations
RET_CHUNK = int(os.environ.get("RECYCLE_RET_CHUNK", 24576))
RET_BUDGET = int(os.environ.get("RECYCLE_RET_BUDGET", 400))


def spec():
    # Small chain (fast remote compile) WITH a filter: the checkpoint
    # must carry real overlap-save history across the generation
    # boundary, and the cold generation must emit exactly one Warmup
    # (valid_from > 0) while resumed generations emit none.
    return Chain(
        FreqShifter.with_shift(5000.0),
        Filter.new(lambda bins, f: np.where(np.abs(f) <= 50e3, 1.0, 0.0)),
        FmDemod(75000.0),
    )


def make_chunks():
    t = np.arange(N_CHUNKS * CHUNK) / RATE
    audio = 0.3 * np.sin(2 * np.pi * 1000.0 * t)
    iq = np.exp(1j * (2 * np.pi * 75000.0 / RATE * np.cumsum(audio))
                - 1j * 2 * np.pi * 5000.0 * t).astype(np.complex64)
    return list(iq.reshape(N_CHUNKS, CHUNK))


def gain_spec():
    # Compute-trivial chain for the retention drill: the upload stream
    # (input chunks) dominates, which is exactly what retention tracks.
    from radiorust_tpu.blocks.transform import GainControl
    return Chain(GainControl(1.0))


def retention_drill():
    """Quantify the RSS reset: 2 generations x RET_BUDGET chunks vs one
    single process serving 2x as much.  The relay client retains ~0.9x
    of every upload for the process lifetime (tools/probe_relay_leak.py),
    so the single process's peak RSS should exceed a generation's by
    roughly one budget's worth of uploads."""
    n, budget = 2 * RET_BUDGET, RET_BUDGET
    rng = np.random.default_rng(0)
    big = [(rng.standard_normal(RET_CHUNK).astype(np.float32)
            + 1j * rng.standard_normal(RET_CHUNK).astype(np.float32)
            ).astype(np.complex64) for _ in range(n)]
    st_rec, st_one = [], []
    outs_r, gens_r, _ = serve_recycling(
        gain_spec, big, RATE, chunks_per_worker=budget,
        ckpt_path="/tmp/recycle_ret.npz", jax_platform=None,
        timeout=600.0, stats=st_rec)
    outs_1, gens_1, _ = serve_recycling(
        gain_spec, big, RATE, chunks_per_worker=n + 1,
        ckpt_path="/tmp/recycle_ret1.npz", jax_platform=None,
        timeout=600.0, stats=st_one)
    assert gens_r == 2 and gens_1 == 1, (gens_r, gens_1)
    np.testing.assert_array_equal(np.concatenate(outs_r),
                                  np.concatenate(outs_1))
    up_mb = RET_CHUNK * 8 * budget / 1e6  # c64 wire planes per budget
    return {
        "chunks": n, "chunk_len": RET_CHUNK,
        "upload_mb_per_generation": round(up_mb, 1),
        "gen_maxrss_mb": [s["maxrss_mb"] for s in st_rec],
        "single_maxrss_mb": st_one[0]["maxrss_mb"],
        "single_minus_worst_gen_mb": round(
            st_one[0]["maxrss_mb"] - max(s["maxrss_mb"] for s in st_rec),
            1),
    }


def main():
    chunks = make_chunks()
    ckpt = "/tmp/recycle_onchip_ckpt.npz"
    t0 = time.monotonic()
    outs, gens, warmups = serve_recycling(
        spec, chunks, RATE, chunks_per_worker=BUDGET, ckpt_path=ckpt,
        jax_platform=None, timeout=600.0)  # None = the environment's relay TPU backend
    t_rec = time.monotonic() - t0
    t0 = time.monotonic()
    ref, gens_ref, _ = serve_recycling(
        spec, chunks, RATE, chunks_per_worker=N_CHUNKS + 1,
        ckpt_path=ckpt + ".ref", jax_platform=None, timeout=600.0)
    t_ref = time.monotonic() - t0
    got = np.concatenate(outs)
    want = np.concatenate(ref)
    err = float(np.max(np.abs(got - want))) if len(got) else float("nan")
    result = {
        "generations": gens,
        "warmups_per_gen": warmups,
        "chunks": N_CHUNKS,
        "chunks_per_worker": BUDGET,
        "samples_out": int(got.size),
        "max_abs_err_vs_single_gen": err,
        "bitwise_equal": bool(np.array_equal(got, want)),
        "recycled_wall_s": round(t_rec, 1),
        "single_gen_wall_s": round(t_ref, 1),
        "ok": bool(gens == 2 and gens_ref == 1
                   and warmups == [1, 0] and err < 1e-5),
    }
    if os.environ.get("RECYCLE_RETENTION", "1") == "1":
        result["retention"] = retention_drill()
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RECYCLE_r05.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
