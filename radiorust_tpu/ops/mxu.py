"""MXU dot-product helpers shared by the Pallas kernels.

The MXU multiplies in bfloat16; ``jax.lax.Precision`` selects a multi-pass
f32 recovery (HIGH = 3 passes, HIGHEST = 6).  Mosaic (the Pallas TPU
compiler) only lowers DEFAULT and HIGHEST, so the 3-pass mode is
implemented manually here: split each f32 operand into a bf16 hi part and
a bf16 lo remainder and accumulate

    a·b  ≈  ahi·bhi + ahi·blo + alo·bhi        (the alo·blo term is
                                                ~2^-16 relative — dropped)

with DEFAULT-precision bf16 matmuls and f32 accumulation.  Measured
~1.5e-6 max/rms error on the WFM transforms (HIGHEST: ~1e-7), inside the
framework's ~1e-3 parity bound, at half HIGHEST's MXU cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radiorust_tpu import config

__all__ = ["make_dot", "make_dot_exact_rhs", "resolve_mode", "pallas_call"]


def pallas_call(*args, **kw):
    """``pl.pallas_call`` with the framework's off-TPU policy: on any
    non-TPU backend (CPU test mesh, multichip dryrun) kernels run in the
    Pallas interpreter — same semantics, pure XLA ops underneath.  Single
    owner of that policy for every kernel module."""
    import jax.experimental.pallas as pl
    if jax.default_backend() != "tpu":
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)

_MODES = {
    jax.lax.Precision.DEFAULT: "default",
    jax.lax.Precision.HIGH: "high",
    jax.lax.Precision.HIGHEST: "highest",
}


def resolve_mode(precision=None) -> str:
    """Normalize a precision argument (None | str | jax.lax.Precision) to
    a mode string, defaulting to the global config."""
    if precision is None:
        return _MODES[config.matmul_precision()]
    if isinstance(precision, str):
        return precision.lower()
    return _MODES[precision]


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_dot(precision=None):
    """Return ``dot(a, b, dimension_numbers)`` honoring the precision mode
    (usable inside Pallas kernels and plain XLA alike)."""
    mode = resolve_mode(precision)
    if mode == "high":
        base = functools.partial(jax.lax.dot_general,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)

        def dot(a, b, dimension_numbers):
            ahi, alo = _split_bf16(a)
            bhi, blo = _split_bf16(b)
            d = lambda x, y: base(x, y, dimension_numbers)
            return d(ahi, bhi) + (d(ahi, blo) + d(alo, bhi))

        return dot
    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[mode]
    return functools.partial(jax.lax.dot_general,
                             preferred_element_type=jnp.float32,
                             precision=prec)


def make_dot_exact_rhs(precision=None):
    """Like :func:`make_dot`, for the special case where the RHS operand is
    known bfloat16-exact (e.g. a 0/1 triangular scan matrix).  In ``high``
    mode the lo remainder of the RHS is identically zero, so the
    ``ahi*blo`` pass is skipped: two bf16 matmuls instead of three, same
    f32 result."""
    mode = resolve_mode(precision)
    if mode != "high":
        return make_dot(mode)
    base = functools.partial(jax.lax.dot_general,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)

    def dot(a, b, dimension_numbers):
        ahi, alo = _split_bf16(a)
        bhi = b.astype(jnp.bfloat16)
        d = lambda x: base(x, bhi, dimension_numbers)
        return d(ahi) + d(alo)

    return dot
