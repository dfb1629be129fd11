#!/usr/bin/env python
"""On-chip stereo MPX decoder A/B: FilterBank vs three separate Filters.

Usage: python tools/exp_stereo.py [bank] [separate]   (default: both)

Single-process, in-session comparison (relay noise cancels; see CLAUDE.md).
Each variant jit-compiles the stereo_mpx_decoder graph (batch 64, 6144-
sample MPX chunks at 384 kHz — the chunk signature the full WFM stereo
receiver feeds it) into one feedback-chained program; both graph outputs
("stereo" and "pilot") feed the checksum so no branch is dead code.  Timing
syncs by fetching the f32 checksum (the only trustworthy sync on the relay
backend).
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc
    _cc.set_cache_dir(os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

from radiorust_tpu.blocks.base import StreamSig, pack_wire, unpack_wire
from radiorust_tpu.models.stereo import MPX_RATE, stereo_mpx_decoder

BATCH = int(os.environ.get("EXP_BATCH", "64"))
N = 6144   # MPX chunk len inside the full receiver (16384 @ 1.024M -> 384k)


def _norm(y):
    e = jnp.mean(jnp.square(y)) + jnp.float32(1e-20)
    return y * jax.lax.rsqrt(e)


def build(use_bank: bool, bank_pallas: bool = True):
    sig = StreamSig(BATCH, N, MPX_RATE)
    bg = stereo_mpx_decoder(use_bank=use_bank).bind({"mpx": sig})
    if use_bank and not bank_pallas:
        from radiorust_tpu.blocks.filters import _BoundFilterBank
        for blk in bg.bound:
            if isinstance(blk, _BoundFilterBank):
                blk._use_pallas = lambda: False
    pparams = pack_wire(bg.params)
    pstate = pack_wire(bg.init_state())

    @jax.jit
    def fn(seed, iters):
        params = unpack_wire(pparams)
        key = jax.random.key(seed)
        x = jax.random.normal(key, (BATCH, N), jnp.float32)

        def body(i, carry):
            st, x, acc = carry
            st, ys = bg.process(params, st,
                                {"mpx": jax.lax.complex(
                                    x, jnp.zeros_like(x))})
            s, p = ys["stereo"], ys["pilot"]
            # Feed both outputs back so neither branch is dead code.
            sr = jnp.real(s) + jnp.imag(s)
            rep = -(-N // sr.shape[-1])
            nx = _norm(jnp.tile(sr, (1, rep))[:, :N] + jnp.real(p))
            acc = acc + jnp.sum(jnp.square(sr)) + jnp.sum(jnp.abs(p) ** 2)
            return st, nx, acc

        st = unpack_wire(pstate)
        _, _, acc = jax.lax.fori_loop(
            0, iters, body, (st, x, jnp.float32(0.0)))
        return acc

    return fn


def main():
    # "bank" = FilterBank (fused VMEM bank kernel on TPU, r4);
    # "bank_xla" = FilterBank forced onto the XLA shared-forward path;
    # "separate" = three standalone Filters.
    variants = sys.argv[1:] or ["bank", "bank_xla", "separate"]
    iters = int(os.environ.get("EXP_ITERS", "4096"))
    built = [(v, build(v.startswith("bank"), bank_pallas=(v == "bank")))
             for v in variants]
    for v, fn in built:
        t0 = time.perf_counter()
        val = float(fn(0, 2))
        assert np.isfinite(val), f"{v}: non-finite warmup checksum"
        print(f"# warm {v}: {time.perf_counter() - t0:.1f}s", flush=True)
    results = {}
    for v, fn in built:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            val = float(fn(0, iters))
            dt = time.perf_counter() - t0
            assert np.isfinite(val), f"{v}: non-finite checksum"
            best = min(best, dt)
        us = best / iters * 1e6
        results[v] = round(us, 1)
        print(json.dumps({
            "variant": v,
            "us_per_step": round(us, 1),
            "msps_equiv": round(BATCH * N / (best / iters) / 1e6, 1),
        }), flush=True)
    print("# summary:", json.dumps(results))


if __name__ == "__main__":
    main()
