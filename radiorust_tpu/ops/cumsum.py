"""Prefix sums as MXU matmuls.

XLA lowers ``jnp.cumsum`` along a long axis as a log-depth shift/add
ladder — a dozen full passes over the array on the VPU.  On TPU a prefix
sum over ``n`` lanes is better spent on the MXU: split the axis into
128-lane rows, multiply each row by a constant 128x128 upper-triangular
ones matrix (one batched matmul = the within-row inclusive scan), then
add an exclusive carry of the row totals (a tiny ``n/128``-lane cumsum).

The triangular matrix is exactly representable in bfloat16 (entries are
0/1), so under the framework's ``high`` 3-pass mode the product is an
f32-exact scan up to accumulation order — no precision mode below
``high`` is ever selected here (a bf16-rounded phase accumulator would
drift by 2^-8 relative, which is audible after FM modulation).

Used by :class:`~radiorust_tpu.blocks.modulation.FmMod` (phase
integration, ``src/blocks/modulation.rs:40-62`` in the reference walks
samples one by one) and the occupied-bandwidth metering walks
(``src/metering.rs:31-74``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from radiorust_tpu import config
from radiorust_tpu.ops import mxu

__all__ = ["matmul_cumsum"]

_ROW = 128


@functools.lru_cache(maxsize=1)
def _tri(row: int) -> np.ndarray:
    # U[i, k] = 1 for i <= k: (x @ U)[k] = sum_{i<=k} x[i], the inclusive scan.
    return np.triu(np.ones((row, row), np.float32))


def matmul_cumsum(x, precision=None):
    """Inclusive prefix sum along the last axis, MXU-formulated.

    Numerically an f32 prefix sum with a different accumulation order
    than ``jnp.cumsum`` (tree-of-rows instead of a shift ladder): results
    agree to f32 ulps of the running total, not bit-for-bit.  Falls back
    to ``jnp.cumsum`` when the axis is short or not lane-aligned.
    """
    n = x.shape[-1]
    if (n % _ROW != 0 or n < 2 * _ROW or x.dtype != jnp.float32
            or config.cumsum_mode() == "xla"):
        return jnp.cumsum(x, axis=-1)
    mode = mxu.resolve_mode(precision)
    if mode == "default":
        mode = "high"  # never bf16-round a running phase/energy total
    # The triangular weight is 0/1 = bf16-exact, so its lo remainder is
    # zero and the ahi*blo pass of 'high' mode would be a wasted matmul.
    dot = mxu.make_dot_exact_rhs(mode)
    r = n // _ROW
    rows = x.reshape(-1, _ROW).astype(jnp.float32)
    cs = dot(rows, jnp.asarray(_tri(_ROW)), (((1,), (0,)), ((), ())))
    cs = cs.reshape(x.shape[:-1] + (r, _ROW))
    tot = cs[..., -1]                                   # [..., r] row sums
    # Exact exclusive prefix: shift the inclusive scan (cumsum - tot
    # cancels catastrophically when one row total dominates the prefix).
    cs0 = jnp.cumsum(tot, axis=-1)
    carry = jnp.concatenate(
        [jnp.zeros_like(tot[..., :1]), cs0[..., :-1]], axis=-1)
    return (cs + carry[..., None]).reshape(x.shape)
