"""Measure per-step collective traffic of the sharded executors.

SCALING.md's halo table was analytic; this tool measures it: the sharded
step programs are compiled (8-device mesh) and the post-SPMD-partitioning
HLO is scanned for collective ops — every ``collective-permute`` /
``all-gather`` / ``all-reduce`` / ``all-to-all`` / ``reduce-scatter`` with
its (per-device, i.e. local-shard) output shape.  Bytes are what one
device sends/receives over ICI per executor step.

Run on any platform (`JAX_PLATFORMS=cpu` forced — the HLO op mix after
partitioning is backend-independent; only codegen differs):

    python tools/collective_volumes.py
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"\b(pred|s8|u8|bf16|f16|s16|u16|f32|s32|u32|f64|"
                       r"s64|u64|c64|c128)\[([0-9,]*)\]")
_OP_RE = re.compile(r"=\s*(?:\([^)]*\)|\S+)\s+"
                    r"(collective-permute|all-gather|all-reduce|"
                    r"all-to-all|reduce-scatter)(?:-start)?\(")


def _bytes_of(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def collective_volumes(hlo_text: str):
    """-> (Counter op->count, Counter op->bytes) from partitioned HLO."""
    counts: Counter = Counter()
    vols: Counter = Counter()
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or "-done(" in line:
            continue
        op = m.group(1)
        # Output shapes precede the op name on the defining line; a tuple
        # output lists each element (async pairs are filtered above).
        head = line[:m.end()]
        total = sum(_bytes_of(d, s) for d, s in _SHAPE_RE.findall(head))
        counts[op] += 1
        vols[op] += total
    return counts, vols


def _compiled_text(jitted, *args):
    return jitted.lower(*args).compile().as_text()


def _time_sharded_volumes(ts, params, state, xs):
    """The full step program — halos AND the inline carry-extraction
    psums (review r3 found the extraction originally ran as a second
    program of all-gathers, 8x the halo bytes, invisible to this tool;
    it is now fused into the step and counted here)."""
    return collective_volumes(
        _compiled_text(ts._graph._sharded, params, state, xs))


def measure_time_sharded_wfm(n: int = 16384, batch: int = 1, d: int = 8):
    from radiorust_tpu.blocks.base import StreamSig
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    mesh = jax.make_mesh((d,), ("t",))
    sig = StreamSig(batch, n, 1024000.0)
    ts = TimeShardedChain(wfm_receiver().bind(sig), mesh)
    x = np.zeros((batch, d * n), np.complex64)
    return _time_sharded_volumes(ts, ((), *ts.params),
                                 ((), *ts.init_state()), {"in": x})


def measure_channel_sharded(d: int = 8):
    from radiorust_tpu.blocks.base import StreamSig
    from radiorust_tpu.models.channelizer import channelized_receiver
    from radiorust_tpu.parallel.channel_shard import ChannelShardedChain
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:d]), ("c",))
    chain = channelized_receiver(num_channels=64, input_rate=1024000.0)
    bound = chain.bind(StreamSig(1, 16384, 1024000.0))
    cs = ChannelShardedChain(bound, mesh, axis="c")
    x = np.zeros((1, 16384), np.complex64)
    reset = np.zeros((1,), bool)
    txt = _compiled_text(cs._sharded, cs.params, cs.init_state(), x, reset)
    return collective_volumes(txt)


def measure_fused_time_sharded(d: int = 8):
    from radiorust_tpu.blocks.base import StreamSig
    from radiorust_tpu.models.wfm import wfm_receiver
    from radiorust_tpu.parallel.time_shard import TimeShardedChain
    mesh = jax.make_mesh((d,), ("t",))
    sig = StreamSig(2, 16384, 1024000.0)
    ts = TimeShardedChain(
        wfm_receiver(fuse_frontend=True, fuse_demod=True).bind(sig), mesh)
    x = np.zeros((2, d * 16384), np.complex64)
    return _time_sharded_volumes(ts, ((), *ts.params),
                                 ((), *ts.init_state()), {"in": x})


def main():
    rows = []
    for name, fn, note in [
        ("WFM time-sharded t=8 (batch 1, n=16384)",
         measure_time_sharded_wfm,
         "per-block halos: 2 filters + 2 resamplers + demod"),
        ("WFM fused Pallas t=8 (batch 2, n=16384)",
         measure_fused_time_sharded,
         "mixed-domain + demod-domain halos"),
        ("Channelizer 64ch channel-sharded c=8 (n=16384)",
         measure_channel_sharded,
         "branch all_gather (decimated data)"),
    ]:
        counts, vols = fn()
        total = sum(vols.values())
        detail = ", ".join(f"{op} x{counts[op]} = {vols[op]/1024:.1f} kB"
                           for op in sorted(counts))
        rows.append((name, total, detail, note))
        print(f"{name}\n  total {total/1024:.1f} kB/device/step"
              f"  [{detail}]  ({note})")
    print()
    print("| configuration | ICI bytes/device/step | breakdown |")
    print("|---|---|---|")
    for name, total, detail, note in rows:
        print(f"| {name} | {total/1024:.1f} kB | {detail} |")


if __name__ == "__main__":
    main()
