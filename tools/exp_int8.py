#!/usr/bin/env python
"""int8 split-precision feasibility for the overlap-save DFT matmuls
(VERDICT r3 item 3 lever c).

The MXU runs int8 at ~2x the bf16 rate, so an int8 multi-pass scheme
beats the 3-pass bf16 'high' mode only if it needs FEWER than 6 int8
passes while staying inside the transform's 2.4e-5 max-rel error budget
(docs/PERF.md).  An int8 part carries 7 magnitude bits vs bf16's 8, so:

- 2-split schemes (3-4 passes, 1.5-2.0 bf16-pass-equivalents) capture
  14 bits -> ~6.7e-5 error: 2.8x OUTSIDE the budget.
- The cheapest in-budget scheme (3-split, cross terms to 2^-21) needs
  6 passes = 3.0 bf16-pass-equivalents: exactly the cost of 'high',
  with extra VPU requantization work on top.

So int8 cannot beat bf16 'high' on this transform at this budget — a
pass-count identity, not a tuning matter.  This script reproduces the
numbers (simulated int8 quantization with per-row scales, int32-exact
accumulation, vs f64 on one block-form DFT stage of the 12288-pt
transform).

    python tools/exp_int8.py
"""

import numpy as np

rng = np.random.default_rng(0)


def split_int8(x, k, axis):
    """x ~ sum_i q_i * s/128^i with q_i int8 (7 bits + sign), per-slice
    scales along ``axis``."""
    s = np.max(np.abs(x), axis=axis, keepdims=True) / 127.0
    s = np.where(s == 0, 1.0, s)
    parts, resid = [], x.copy()
    for i in range(k):
        scale = s / (128.0 ** i)
        q = np.clip(np.round(resid / scale), -127, 127)
        parts.append((q, scale))
        resid = resid - q * scale
    return parts


def int8_matmul(a, b, ka, kb, max_weight):
    """Multi-pass int8 product keeping cross terms of combined weight
    128^-(i+j) for i + j < max_weight; int32 accumulation is exact."""
    pa = split_int8(a, ka, axis=1)   # per-row scales
    pb = split_int8(b, kb, axis=0)   # per-col scales
    acc = np.zeros((a.shape[0], b.shape[1]))
    passes = 0
    for i, (qa, sa) in enumerate(pa):
        for j, (qb, sb) in enumerate(pb):
            if i + j >= max_weight:
                continue
            acc += (qa @ qb) * (sa * sb)
            passes += 1
    return acc, passes


def main():
    # One block-form DFT stage of the WFM 12288-pt transform (K = 192).
    n1 = 96
    k1 = np.arange(n1)
    d1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)
    C = np.block([[d1.real, -d1.imag], [d1.imag, d1.real]])
    Z = rng.standard_normal((192, 1024))
    ref = C @ Z
    for ka, kb, mw, label in [
            (2, 2, 2, "2-split, drop cross (3 passes)"),
            (2, 2, 3, "2-split full (4 passes)"),
            (3, 3, 3, "3-split to 2^-21 (6 passes)"),
            (3, 3, 4, "3-split to 2^-28 (8 passes)")]:
        got, p = int8_matmul(C, Z, ka, kb, mw)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"{label}: max rel {err:.2e}, int8 passes {p} "
              f"(~{p / 2:.1f} bf16-pass-equiv; 'high'=3)")


if __name__ == "__main__":
    main()
