"""Golden tests for metering, values from ``src/metering.rs:116-259``,
plus device-variant equivalence checks."""

import numpy as np
import pytest

from radiorust_tpu.metering import (
    bandwidth,
    bandwidth_jax,
    level,
    level_jax,
    rescale_energy,
    rescale_energy_jax,
)

SQRT_HALF = 1.0 / np.sqrt(2.0)


def assert_approx(a, b):
    if abs(a - b) > 1e-10:
        assert a * b > 0.0, f"{a} !~ {b}"
        assert abs(np.log(abs(a)) - np.log(abs(b))) <= 1e-10, f"{a} !~ {b}"


def osc8():
    return np.array([
        1, SQRT_HALF + 1j * SQRT_HALF, 1j, -SQRT_HALF + 1j * SQRT_HALF,
        -1, -SQRT_HALF - 1j * SQRT_HALF, -1j, SQRT_HALF - 1j * SQRT_HALF,
    ])


def test_level_complex_osc():
    assert_approx(np.log10(level(osc8())) * 10.0, 0.0)


def test_level_doc_example():
    chunk = np.array([0.0, -0.5j, 1.0])
    assert abs(level(chunk) - 0.41666667) < 0.001


def test_bandwidth_silence():
    assert_approx(bandwidth(0.01, 48000.0, np.zeros(2, complex)), 0.0)


def test_bandwidth_spreadspectrum():
    bins = np.array([1, 1, 1, 1, 1, 1, -1, np.sqrt(0.5) - 1j * np.sqrt(0.5)])
    assert_approx(bandwidth(0.01, 48000.0, bins), 0.99 * 48000.0)


def test_bandwidth_spreadspectrum_odd():
    bins = np.array([7.4 - 2.1j] * 3)
    assert_approx(bandwidth(0.01, 48000.0, bins), 0.99 * 48000.0)


def test_bandwidth_carrier():
    bins = np.zeros(8, complex)
    bins[6] = 2.1
    assert_approx(bandwidth(0.01, 48000.0, bins), 0.99 * 48000.0 / 8.0)


def test_bandwidth_two_carriers():
    bins = np.zeros(8, complex)
    bins[0] = 1.5
    bins[6] = 1.5
    assert_approx(bandwidth(0.01, 48000.0, bins), 2.98 * 48000.0 / 8.0)


def test_rescale_energy_same_size():
    out = rescale_energy(3, np.array([0.0, 2.0 + 1j, -0.5]))
    np.testing.assert_allclose(out, [0.0, 5.0, 0.25], atol=1e-10)


def test_rescale_energy_smaller():
    out = rescale_energy(3, np.array([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(
        out, [2.3333333333333, 8.6666666666667, 19.0], atol=1e-10)


def test_rescale_energy_larger():
    out = rescale_energy(4, np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(out, [0.75, 2.25, 4.25, 6.75], atol=1e-10)


# --- device variants agree with host variants -----------------------------

def test_level_jax_matches():
    x = osc8().astype(np.complex64)[None, :].repeat(3, 0)
    got = np.asarray(level_jax(x))
    np.testing.assert_allclose(got, [level(osc8())] * 3, rtol=1e-6)


def test_bandwidth_jax_matches():
    cases = [
        np.zeros(8, complex),
        np.array([1, 1, 1, 1, 1, 1, -1, np.sqrt(0.5) - 1j * np.sqrt(0.5)]),
        np.r_[np.zeros(6), 2.1, 0.0].astype(complex),
        np.array([1.5, 0, 0, 0, 0, 0, 1.5, 0], complex),
    ]
    batch = np.stack(cases).astype(np.complex64)
    got = np.asarray(bandwidth_jax(0.01, 48000.0, batch))
    want = [bandwidth(0.01, 48000.0, c) for c in cases]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_rescale_energy_jax_matches():
    rng = np.random.default_rng(0)
    bins = (rng.standard_normal((4, 16)) + 1j * rng.standard_normal((4, 16)))
    got = np.asarray(rescale_energy_jax(7, bins.astype(np.complex64)))
    want = np.stack([rescale_energy(7, b) for b in bins])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bandwidth_jax_single_scan_equals_two_scan_form():
    # The shipping bandwidth_jax derives the reverse walk from the
    # forward cumsum (crev[k] = S - c[n-2-k]); it must equal the literal
    # two-cumsum construction (_discount_jax on walked and reversed) up
    # to f32 ulps on random spectra.
    import jax.numpy as jnp

    from radiorust_tpu.metering import (_bin_walk_order, _discount_jax,
                                        bandwidth_jax)
    rng = np.random.default_rng(9)
    for n in (64, 257, 1024):
        bins = (rng.standard_normal((5, n))
                + 1j * rng.standard_normal((5, n))).astype(np.complex64)
        # Concentrate energy so the walks terminate mid-array.
        bins[:, n // 3: n // 3 + 8] *= 40.0
        e = jnp.abs(jnp.asarray(bins)) ** 2
        limit = jnp.sum(e, axis=-1) * (0.01 / 2.0)
        w = e[..., np.asarray(_bin_walk_order(n))]
        used2 = np.asarray(_discount_jax(w, limit)
                           + _discount_jax(w[..., ::-1], limit))
        got = np.asarray(bandwidth_jax(0.01, float(n), jnp.asarray(bins)))
        want = np.maximum((n - used2) * (n / n), 0.0)
        np.testing.assert_allclose(got, want, atol=1e-2)
