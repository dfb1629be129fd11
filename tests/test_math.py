"""Golden tests for DSP math, values from the reference's unit tests
(``src/math.rs:56-85``)."""

import numpy as np
import pytest

from radiorust_tpu.math import (
    bessel_i0,
    kaiser_alpha_to_beta,
    kaiser_null_at_bin_to_beta,
    sinc,
)


def assert_approx(a, b):
    # Mirrors the reference's assert_approx (src/lib.rs:51-59): 1e-10
    # absolute or log-relative tolerance.
    if abs(a - b) > 1e-10:
        assert a * b > 0.0, f"{a} !~ {b}"
        assert abs(np.log(abs(a)) - np.log(abs(b))) <= 1e-10, f"{a} !~ {b}"


def test_bessel_i0():
    assert bessel_i0(0.0) == 1.0
    assert bessel_i0(-np.inf) == np.inf
    assert bessel_i0(np.inf) == np.inf
    assert np.isnan(bessel_i0(np.nan))
    assert_approx(bessel_i0(0.5), 1.06348337074132)
    assert_approx(bessel_i0(-0.5), 1.06348337074132)
    assert_approx(bessel_i0(1.23), 1.41552757215846)
    assert_approx(bessel_i0(15.8), 736184.938479417)
    assert_approx(bessel_i0(456.0), 2.04094157812291e196)
    assert bessel_i0(1000.0) == np.inf
    assert bessel_i0(-1000.0) == np.inf


def test_bessel_i0_vectorized():
    xs = np.array([0.0, 0.5, 1.23, 15.8])
    got = bessel_i0(xs)
    expect = [1.0, 1.06348337074132, 1.41552757215846, 736184.938479417]
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_sinc():
    assert sinc(0.0) == 1.0
    assert_approx(sinc(0.4), 0.756826728640657)
    assert_approx(sinc(-0.4), 0.756826728640657)
    assert_approx(sinc(1.0), 0.0)
    assert_approx(sinc(2.0), 0.0)
    assert_approx(sinc(2.6), 0.11643488132933186)
    assert_approx(sinc(-2.6), 0.11643488132933186)
    assert_approx(sinc(5.8), -0.03225825116512552)
    assert_approx(sinc(-5.8), -0.03225825116512552)
    assert_approx(sinc(17.0), 0.0)
    assert_approx(sinc(2345.0), 0.0)


def test_kaiser_conversions():
    assert_approx(kaiser_alpha_to_beta(2.0), 2.0 * np.pi)
    assert_approx(kaiser_null_at_bin_to_beta(2.0), np.sqrt(3.0))
    assert_approx(kaiser_null_at_bin_to_beta(1.0), 0.0)
