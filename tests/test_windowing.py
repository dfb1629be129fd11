"""Window function tests (semantics of ``src/windowing.rs``)."""

import numpy as np

from radiorust_tpu.math import bessel_i0
from radiorust_tpu.windowing import (
    CustomWindow,
    Kaiser,
    Rectangular,
    Window,
    window_table,
)


def test_rectangular():
    w = Rectangular()
    x = np.linspace(-1, 1, 7)
    np.testing.assert_array_equal(w.relative_value_at(x), np.ones(7))


def test_kaiser_constructors_agree():
    # alpha = beta/pi; null_at_bin n has beta = sqrt(n^2-1)
    a = Kaiser.with_beta(2.0)
    b = Kaiser.with_alpha(2.0 / np.pi)
    np.testing.assert_allclose(a.beta, b.beta, rtol=1e-15)
    c = Kaiser.with_null_at_bin(2.0)
    np.testing.assert_allclose(c.beta, np.sqrt(3.0), rtol=1e-15)


def test_kaiser_values():
    w = Kaiser.with_beta(3.0)
    # At x=0 the Kaiser window equals I0(beta).
    np.testing.assert_allclose(w.relative_value_at(0.0), bessel_i0(3.0))
    # At |x|=1 it equals I0(0) = 1.
    np.testing.assert_allclose(w.relative_value_at(1.0), 1.0)
    np.testing.assert_allclose(w.relative_value_at(-1.0), 1.0)
    # Symmetric.
    np.testing.assert_allclose(
        w.relative_value_at(0.3), w.relative_value_at(-0.3))


def test_custom_window():
    w = CustomWindow(lambda x: 1.0 - np.abs(x))
    np.testing.assert_allclose(w.relative_value_at(np.array([0.0, 0.5])),
                               [1.0, 0.5])


def test_window_table_positions():
    # Table positions are 2*(i+0.5)/n - 1 (bin-centered), per
    # src/blocks/analysis.rs:91-93.
    w = CustomWindow(lambda x: x)
    tab = window_table(w, 4)
    np.testing.assert_allclose(tab, [-0.75, -0.25, 0.25, 0.75])
