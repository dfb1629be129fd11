"""Matmul four-step FFT correctness vs numpy."""

import numpy as np
import pytest

import jax.numpy as jnp

from radiorust_tpu.ops.fft import fft, ifft, plan_factors


@pytest.mark.parametrize("n", [1024, 4096, 8192, 12288, 6144])
def test_matfft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    got = np.asarray(fft(jnp.asarray(x)))
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=n * 2e-6)
    got_i = np.asarray(ifft(jnp.asarray(x)))
    want_i = np.fft.ifft(x)
    np.testing.assert_allclose(got_i, want_i, rtol=2e-3, atol=2e-5)


def test_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 12288)) + 1j * rng.standard_normal((2, 12288))
         ).astype(np.complex64)
    y = np.asarray(ifft(fft(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, atol=5e-4)


def test_plan_factors():
    assert plan_factors(12288) == (96, 128)
    assert plan_factors(8192) == (64, 128)
    assert plan_factors(6144) == (64, 96)
    assert plan_factors(13) is None
