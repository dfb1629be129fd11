"""MXU matmul prefix sum (ops/cumsum.py) vs jnp.cumsum / f64."""

import jax.numpy as jnp
import numpy as np
import pytest

from radiorust_tpu import config
from radiorust_tpu.ops.cumsum import matmul_cumsum


@pytest.mark.parametrize("shape", [(3, 4096), (64, 4096), (2, 3, 512),
                                   (5, 100), (4, 128), (1, 256)])
def test_matches_f64_within_f32_scan_error(shape):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(matmul_cumsum(jnp.asarray(x)))
    f64 = np.cumsum(x.astype(np.float64), axis=-1)
    f32 = np.asarray(jnp.cumsum(jnp.asarray(x), axis=-1))
    scale = np.max(np.abs(f64))
    err_got = np.max(np.abs(got - f64)) / scale
    err_f32 = np.max(np.abs(f32 - f64)) / scale
    # Different accumulation order than the shift ladder, same error class.
    assert err_got <= max(4 * err_f32, 1e-6)


def test_short_or_unaligned_falls_back_exactly():
    rng = np.random.default_rng(1)
    for shape in [(2, 100), (2, 128), (3, 130)]:
        x = rng.standard_normal(shape).astype(np.float32)
        got = np.asarray(matmul_cumsum(jnp.asarray(x)))
        ref = np.asarray(jnp.cumsum(jnp.asarray(x), axis=-1))
        np.testing.assert_array_equal(got, ref)


def test_xla_mode_knob_is_exact_passthrough():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    config.set_cumsum_mode("xla")
    try:
        got = np.asarray(matmul_cumsum(jnp.asarray(x)))
    finally:
        config.set_cumsum_mode(None)
    ref = np.asarray(jnp.cumsum(jnp.asarray(x), axis=-1))
    np.testing.assert_array_equal(got, ref)


def test_monotone_on_nonnegative_input():
    # Metering walks compare a running energy total against a limit; the
    # matmul form must stay monotone for nonnegative energies.  On a real
    # MXU the bf16 hi/lo split can glitch row boundaries by ~1 ulp of the
    # running total (x_lo may be negative), so allow that tolerance rather
    # than asserting strict monotonicity (which only holds on CPU).
    rng = np.random.default_rng(3)
    e = (rng.standard_normal((2, 4096)) ** 2).astype(np.float32)
    c = np.asarray(matmul_cumsum(jnp.asarray(e)))
    tol = 4 * np.finfo(np.float32).eps * c[..., -1:]
    assert np.all(np.diff(c, axis=-1) >= -tol)
