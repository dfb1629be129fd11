"""Fused Pallas overlap-save filter vs the reference formulation
(interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radiorust_tpu.ops.pallas_filter import (fused_overlap_save,
                                             response_to_grid, supported)


def reference_overlap_save(prev, cur, response):
    buf = np.concatenate([prev, cur], axis=-1)
    spec = np.fft.fft(buf) * response
    return np.fft.ifft(spec)[..., : cur.shape[-1]]


@pytest.mark.parametrize("n,batch", [(6144, 4), (2048, 8), (6144, 3)])
def test_fused_filter_matches_reference(n, batch):
    assert supported(n)
    rng = np.random.default_rng(n + batch)
    prev = (rng.standard_normal((batch, n))
            + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    cur = (rng.standard_normal((batch, n))
           + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    resp = (rng.standard_normal(2 * n)
            + 1j * rng.standard_normal(2 * n)).astype(np.complex64)
    gr, gi = response_to_grid(resp)
    import radiorust_tpu.ops.pallas_filter as pf
    import jax.experimental.pallas as pl

    # Run the kernel in interpreter mode on CPU.
    orig = pl.pallas_call
    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)
    pf.pl.pallas_call = interp_call
    try:
        outr, outi = fused_overlap_save(
            jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(gr), jnp.asarray(gi))
    finally:
        pf.pl.pallas_call = orig
    got = np.asarray(outr) + 1j * np.asarray(outi)
    want = reference_overlap_save(prev, cur, resp)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_supported_sizes():
    assert supported(6144)      # 2n=12288 = 96*128
    assert supported(2048)      # 4096 = 64... plan_factors(4096)=(64,64)?
