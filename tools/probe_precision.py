#!/usr/bin/env python
"""On-chip accuracy probe for the matmul-precision / 3mul config modes.

Runs the fused overlap-save kernel on the TPU in each numeric mode and
reports the per-sample error against a float64 numpy reference, normalized
by the output RMS (an SNR-style measure; the framework's parity bound is
~1e-3 relative).  All device puts happen before any fetch (CLAUDE.md #4).
"""

import os
import pathlib
import sys

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

from radiorust_tpu import config
from radiorust_tpu.ops.pallas_filter import (fused_overlap_save,
                                             response_to_grid)

BATCH, N = 8, 6144

MODES = [("highest", False), ("high", False),
         ("highest", True), ("high", True)]


def main():
    rng = np.random.default_rng(3)
    prev = (rng.standard_normal((BATCH, N))
            + 1j * rng.standard_normal((BATCH, N)))
    cur = (rng.standard_normal((BATCH, N))
           + 1j * rng.standard_normal((BATCH, N)))
    # A realistic lowpass-ish response (random smooth magnitude).
    resp = (rng.standard_normal(2 * N) + 1j * rng.standard_normal(2 * N))
    gr, gi = response_to_grid(resp.astype(np.complex64))

    # float64 reference on the host.
    buf = np.concatenate([prev, cur], axis=-1)
    want = np.fft.ifft(np.fft.fft(buf) * resp)[:, :N]
    rms = np.sqrt(np.mean(np.abs(want) ** 2))

    args = [np.ascontiguousarray(a, np.float32)
            for a in (prev.real, prev.imag, cur.real, cur.imag, gr, gi)]

    results = []
    for prec, cmm in MODES:
        config.set_matmul_precision(prec)
        config.set_complex_mm_3mul(cmm)

        @jax.jit
        def run(pr, pi, cr, ci, g_r, g_i):
            return fused_overlap_save(pr, pi, cr, ci, g_r, g_i)

        try:
            outr, outi = run(*args)
        finally:
            config.set_matmul_precision(None)
            config.set_complex_mm_3mul(None)
        results.append((prec, cmm, outr, outi))

    for prec, cmm, outr, outi in results:       # fetches after all puts
        got = np.asarray(outr) + 1j * np.asarray(outi)
        err = np.max(np.abs(got - want)) / rms
        print(f"precision={prec:8s} 3mul={int(cmm)}  "
              f"max|err|/rms = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
