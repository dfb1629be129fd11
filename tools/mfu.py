#!/usr/bin/env python
"""FLOP / HBM-byte accounting for every BASELINE config — makes the
"near roofline" claims in docs/PERF.md falsifiable (VERDICT r2 item 2).

FLOPs are counted by XLA's own cost analysis of the *compiled* program on
the CPU backend: Pallas kernels run in interpret mode there, so every
matmul pass they issue (including the manual 3-pass bf16 decomposition of
``RRTPU_MATMUL_PRECISION=high`` — the passes the MXU really executes)
appears as an ordinary dot in the HLO and is counted.  The HLO op mix is
backend-independent; only codegen differs, so the count transfers to the
TPU program.

HBM bytes per step use the kernel-boundary model: each stage reads its
input chunk + carried state + params and writes its output + new state;
VMEM-resident intermediates inside a fused kernel are free.  For
XLA-path stages that XLA splits into several fused kernels this is a
*lower bound* (intermediates may round-trip HBM); it is exact for the
single-kernel Pallas stages.

Outputs ``MFU.json`` and a markdown roofline table.  ``bench.py`` runs
this in a CPU subprocess to attach ``mfu`` / ``achieved_tflops`` fields
to the bench artifact:

    python tools/mfu.py                 # all configs, writes MFU.json
    python tools/mfu.py --json-only wfm # one config, one JSON line
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("RRTPU_MATMUL_PRECISION", "high")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from radiorust_tpu.blocks.base import StreamSig

# TPU v5e (the relay chip reports "TPU v5 lite") public peak numbers.
PEAK_BF16_TFLOPS = float(os.environ.get("RRTPU_PEAK_TFLOPS", "197"))
PEAK_HBM_GBPS = float(os.environ.get("RRTPU_PEAK_GBPS", "819"))

BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def _configs():
    from radiorust_tpu.blocks.base import Chain
    from radiorust_tpu.blocks.filters import Filter
    from radiorust_tpu.blocks.resampling import Downsampler
    from radiorust_tpu.blocks.transform import FreqShifter
    from radiorust_tpu.models.bandwidth_meter import bandwidth_meter_chain
    from radiorust_tpu.models.channelizer import channelized_receiver
    from radiorust_tpu.models.morse_tx import (morse_audio_chain,
                                               morse_rf_chain)
    from radiorust_tpu.models.wfm import (WFM_INPUT_CHUNK, WFM_INPUT_RATE,
                                          wfm_receiver)

    def lp(bins, freqs):
        return np.where(np.abs(freqs) <= 500000.0, 1.0 + 0.0j, 0.0j)

    # "wfm" honors the bench fuse knobs so bench.py's subprocess call
    # always accounts the SAME chain it timed (including the unfused
    # fallback re-exec); defaults match bench.py's defaults.
    wfm_f = os.environ.get("BENCH_FUSE_FRONTEND", "1") == "1"
    wfm_fd = os.environ.get("BENCH_FUSE_DEMOD", "1") == "1"
    wfm_chunk = int(os.environ.get("BENCH_CHUNK", "24576"))
    wfm_ir = int(os.environ.get("BENCH_IR", "6144"))
    from radiorust_tpu.models.stereo import wfm_stereo_receiver
    return {
        "wfm": (wfm_receiver(fuse_frontend=wfm_f, fuse_demod=wfm_fd,
                             filter_ir_len=wfm_ir),
                wfm_chunk, WFM_INPUT_RATE),
        "stereo": (wfm_stereo_receiver(), WFM_INPUT_CHUNK,
                   WFM_INPUT_RATE),
        "wfm_unfused": (wfm_receiver(), WFM_INPUT_CHUNK, WFM_INPUT_RATE),
        "morse": (morse_audio_chain(), 4096, 48000.0),
        "morse_rf": (morse_rf_chain(), 4096, 128000.0),
        "audiopipe": (Chain(FreqShifter.with_shift(-100000.0),
                            Filter.new(lp),
                            Downsampler(1200000.0, 1000000.0)),
                      16384, 2400000.0),
        "bw_meter": (bandwidth_meter_chain(fuse_frontend=wfm_f), 10240,
                     1024000.0),
        "channelizer": (channelized_receiver(), 65536, 8192000.0),
    }


def _nbytes(tree) -> int:
    return int(sum(np.asarray(leaf).nbytes
                   for leaf in jax.tree.leaves(tree)))


def _flops(fn, *args) -> float:
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def analyze(name, chain, n, rate, batch):
    from radiorust_tpu.blocks.graph import Graph
    is_graph = isinstance(chain, Graph)
    sig = StreamSig(batch, n, rate)
    bound = chain.bind({"iq": sig} if is_graph else sig)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((batch, n))
         + 1j * rng.standard_normal((batch, n))).astype(np.complex64)

    if is_graph:
        # DAG models (stereo): whole-graph totals only (fan-out reuse
        # makes per-node IO accounting double-count shared values).
        total_flops = _flops(lambda p, st, xs: bound.process(p, st, xs),
                             bound.params, bound.init_state(), {"iq": x})
        st = bound.init_state()
        _, y = jax.jit(bound.process)(bound.params, st, {"iq": x})
        total_bytes = (_nbytes(x) + _nbytes(st) * 2
                       + _nbytes(bound.params) + _nbytes(y))
        in_samples = batch * n
        return {
            "config": name, "batch": batch, "chunk": n,
            "flops_per_step": total_flops,
            "flops_per_input_sample": total_flops / in_samples,
            "hbm_bytes_per_step": total_bytes,
            "hbm_bytes_per_input_sample": total_bytes / in_samples,
            "arithmetic_intensity": total_flops / max(total_bytes, 1),
            "peak_bf16_tflops": PEAK_BF16_TFLOPS,
            "peak_hbm_gbps": PEAK_HBM_GBPS,
            "matmul_precision": os.environ["RRTPU_MATMUL_PRECISION"],
            "stages": [],
        }

    stages = []
    blocks = getattr(bound, "blocks", None)
    if blocks is None:
        blocks, params = (bound,), (bound.params,)
    else:
        params = bound.params
    xcur = x
    for blk, p in zip(blocks, params):
        st = blk.init_state()
        # Blocks that fold channels into the batch axis (Channelizer)
        # change the stream count mid-chain — reset tracks it.
        reset = np.zeros((xcur.shape[0],), bool)
        fl = _flops(blk.process, p, st, xcur, reset)
        io = (_nbytes(xcur) + _nbytes(st) * 2 + _nbytes(p))
        new_st, y = jax.jit(blk.process)(p, st, xcur, reset)
        io += _nbytes(y)
        stages.append({
            "stage": type(blk).__name__.lstrip("_"),
            "flops": fl,
            "hbm_bytes": io,
        })
        xcur = np.asarray(y)

    total_flops = _flops(bound.process, bound.params, bound.init_state(),
                         x, np.zeros((batch,), bool))
    total_bytes = sum(s["hbm_bytes"] for s in stages)
    in_samples = batch * n
    return {
        "config": name,
        "batch": batch,
        "chunk": n,
        "flops_per_step": total_flops,
        "flops_per_input_sample": total_flops / in_samples,
        "hbm_bytes_per_step": total_bytes,
        "hbm_bytes_per_input_sample": total_bytes / in_samples,
        "arithmetic_intensity": total_flops / max(total_bytes, 1),
        "peak_bf16_tflops": PEAK_BF16_TFLOPS,
        "peak_hbm_gbps": PEAK_HBM_GBPS,
        "matmul_precision": os.environ["RRTPU_MATMUL_PRECISION"],
        "stages": stages,
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_only = "--json-only" in sys.argv
    cfgs = _configs()
    names = args or list(cfgs)
    out = {}
    for name in names:
        chain, n, rate = cfgs[name]
        out[name] = analyze(name, chain, n, rate, BATCH)
        if json_only:
            print(json.dumps(out[name]))
            continue
        r = out[name]
        print(f"\n## {name}  (batch {r['batch']}, chunk {r['chunk']}, "
              f"{r['matmul_precision']} matmuls)")
        print(f"total: {r['flops_per_input_sample']:.1f} FLOP/sample, "
              f"{r['hbm_bytes_per_input_sample']:.1f} HBM B/sample, "
              f"intensity {r['arithmetic_intensity']:.1f} FLOP/B")
        print("| stage | MFLOP/step | FLOP/sample | HBM kB/step |")
        print("|---|---|---|---|")
        for s in r["stages"]:
            print(f"| {s['stage']} | {s['flops'] / 1e6:.2f} | "
                  f"{s['flops'] / (r['batch'] * r['chunk']):.1f} | "
                  f"{s['hbm_bytes'] / 1e3:.1f} |")
    if not json_only:
        path = REPO / "MFU.json"
        path.write_text(json.dumps(out, indent=1))
        print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
