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


@pytest.mark.parametrize("m,n,batch", [(512, 1536, 4), (1024, 3072, 3),
                                       (1536, 512, 2)])
def test_fused_filter_decoupled_geometry(m, n, batch):
    """History length m decoupled from the chunk length n: the kernel
    filters n new samples against an m-sample history over one
    (m+n)-point transform (VERDICT r4 item 1 — the geometry that unlocks
    full 128x128 MXU tiles at the flagship sizes)."""
    assert supported(n, m)
    rng = np.random.default_rng(m + n + batch)
    prev = (rng.standard_normal((batch, m))
            + 1j * rng.standard_normal((batch, m))).astype(np.complex64)
    cur = (rng.standard_normal((batch, n))
           + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    resp = (rng.standard_normal(m + n)
            + 1j * rng.standard_normal(m + n)).astype(np.complex64)
    gr, gi = response_to_grid(resp)
    outr, outi = fused_overlap_save(
        jnp.asarray(prev.real), jnp.asarray(prev.imag),
        jnp.asarray(cur.real), jnp.asarray(cur.imag),
        jnp.asarray(gr), jnp.asarray(gi))
    got = np.asarray(outr) + 1j * np.asarray(outi)
    want = reference_overlap_save(prev, cur, resp)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_fused_bank_decoupled_geometry():
    """The bank kernel under the decoupled geometry equals per-band
    fused_overlap_save calls with the same m-sample history."""
    import radiorust_tpu.ops.pallas_filter as pf

    m, n, batch, K = 512, 1536, 4, 2
    rng = np.random.default_rng(17)
    prev = (rng.standard_normal((batch, m))
            + 1j * rng.standard_normal((batch, m))).astype(np.complex64)
    cur = (rng.standard_normal((batch, n))
           + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    resps = (rng.standard_normal((K, m + n))
             + 1j * rng.standard_normal((K, m + n))).astype(np.complex64)
    grids = [response_to_grid(resps[k]) for k in range(K)]
    outr, outi = pf.fused_filter_bank(
        jnp.asarray(prev.real), jnp.asarray(prev.imag),
        jnp.asarray(cur.real), jnp.asarray(cur.imag),
        jnp.asarray(np.stack([g[0] for g in grids])),
        jnp.asarray(np.stack([g[1] for g in grids])))
    for k in range(K):
        wr, wi = fused_overlap_save(
            jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(grids[k][0]), jnp.asarray(grids[k][1]))
        np.testing.assert_allclose(np.asarray(outr[:, k]),
                                   np.asarray(wr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(outi[:, k]),
                                   np.asarray(wi), atol=1e-5)


def test_supported_sizes():
    assert supported(6144)      # 2n=12288 = 96*128
    assert supported(2048)      # 4096 = 64... plan_factors(4096)=(64,64)?


def test_3mul_complex_matmul_matches_4mul():
    """Gauss 3-multiplication mode is numerically equivalent to the
    4-multiplication form (exact on CPU f32 up to association order)."""
    from radiorust_tpu import config

    n, batch = 2048, 4
    rng = np.random.default_rng(7)
    mk = lambda: (rng.standard_normal((batch, n))
                  + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    prev, cur = mk(), mk()
    resp = (rng.standard_normal(2 * n)
            + 1j * rng.standard_normal(2 * n)).astype(np.complex64)
    gr, gi = response_to_grid(resp)
    args = (jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(gr), jnp.asarray(gi))

    base = fused_overlap_save(*args)
    config.set_complex_mm_3mul(True)
    try:
        fast = fused_overlap_save(*args)
    finally:
        config.set_complex_mm_3mul(None)
    for a, b in zip(base, fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_3mul_fft_matches_numpy():
    from radiorust_tpu import config
    from radiorust_tpu.ops.fft import fft as matfft

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((3, 12288))
         + 1j * rng.standard_normal((3, 12288))).astype(np.complex64)
    config.set_complex_mm_3mul(True)
    try:
        got = np.asarray(matfft(jnp.asarray(x)))
    finally:
        config.set_complex_mm_3mul(None)
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-2)


def test_high_mode_manual_bf16_3pass():
    """'high' precision lowers as a manual bf16 hi/lo 3-pass decomposition
    (Mosaic rejects lax.Precision.HIGH); error must be ~1e-5 relative."""
    from radiorust_tpu import config

    n, batch = 2048, 4
    rng = np.random.default_rng(13)
    mk = lambda: (rng.standard_normal((batch, n))
                  + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    prev, cur = mk(), mk()
    resp = (rng.standard_normal(2 * n)
            + 1j * rng.standard_normal(2 * n)).astype(np.complex64)
    gr, gi = response_to_grid(resp)
    args = (jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(gr), jnp.asarray(gi))

    base = fused_overlap_save(*args)
    config.set_matmul_precision("high")
    try:
        fast = fused_overlap_save(*args)
    finally:
        config.set_matmul_precision(None)
    rms = float(np.sqrt(np.mean(np.square(np.asarray(base[0])))))
    for a, b in zip(base, fast):
        err = np.max(np.abs(np.asarray(a) - np.asarray(b))) / rms
        assert err < 5e-4, err


def test_block_mm_matches_classic():
    """config.filter_blockmm: the block-matrix pipeline (one real dot per
    DFT stage on [[Cr,-Ci],[Ci,Cr]] operands) must match the classic
    complex-matmul pipeline within reduction-order ulps, in both 'high'
    (precomputed bf16 hi/lo constants) and 'highest' modes."""
    from radiorust_tpu import config
    rng = np.random.default_rng(11)
    batch, n = 4, 2048
    mk = lambda: (rng.standard_normal((batch, n))
                  + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    prev, cur = mk(), mk()
    resp = (rng.standard_normal(2 * n)
            + 1j * rng.standard_normal(2 * n)).astype(np.complex64)
    gr, gi = response_to_grid(resp)
    args = (jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(gr), jnp.asarray(gi))
    for prec, tol in (("highest", 1e-5), ("high", 1e-4)):
        config.set_matmul_precision(prec)
        try:
            config.set_filter_blockmm(False)
            classic = fused_overlap_save(*args)
            config.set_filter_blockmm(True)
            block = fused_overlap_save(*args)
        finally:
            config.set_filter_blockmm(None)
            config.set_matmul_precision(None)
        rms = float(np.sqrt(np.mean(np.square(np.asarray(classic[0])))))
        for a, b in zip(classic, block):
            err = np.max(np.abs(np.asarray(a) - np.asarray(b))) / rms
            assert err < tol, (prec, err)


def test_fused_filter_bank_matches_per_band_kernels():
    """The fused bank kernel (ONE forward transform, K response multiplies
    + inverses in VMEM) equals K independent fused_overlap_save calls —
    the forward stage is the identical computation on identical
    constants, so each band's output matches its standalone filter."""
    import jax.experimental.pallas as pl

    import radiorust_tpu.ops.pallas_filter as pf

    n, batch, K = 2048, 4, 3
    rng = np.random.default_rng(9)
    prev = (rng.standard_normal((batch, n))
            + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    cur = (rng.standard_normal((batch, n))
           + 1j * rng.standard_normal((batch, n))).astype(np.complex64)
    resps = (rng.standard_normal((K, 2 * n))
             + 1j * rng.standard_normal((K, 2 * n))).astype(np.complex64)
    grids = [response_to_grid(resps[k]) for k in range(K)]

    orig = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    pf.pl.pallas_call = interp_call
    try:
        outr, outi = pf.fused_filter_bank(
            jnp.asarray(prev.real), jnp.asarray(prev.imag),
            jnp.asarray(cur.real), jnp.asarray(cur.imag),
            jnp.asarray(np.stack([g[0] for g in grids])),
            jnp.asarray(np.stack([g[1] for g in grids])))
        for k in range(K):
            wr, wi = fused_overlap_save(
                jnp.asarray(prev.real), jnp.asarray(prev.imag),
                jnp.asarray(cur.real), jnp.asarray(cur.imag),
                jnp.asarray(grids[k][0]), jnp.asarray(grids[k][1]))
            np.testing.assert_allclose(np.asarray(outr[:, k]),
                                       np.asarray(wr), atol=1e-5)
            np.testing.assert_allclose(np.asarray(outi[:, k]),
                                       np.asarray(wi), atol=1e-5)
    finally:
        pf.pl.pallas_call = orig


def test_bank_supported_vmem_budget():
    """Oversized banks degrade gracefully: the tile HALVES until the
    K-scaling live set fits VMEM (bank_tile); only banks too large at
    tile 1 fall back to the XLA formulation (exceeding the budget would
    fail Mosaic compilation instead)."""
    from radiorust_tpu.ops.pallas_filter import bank_supported, bank_tile
    assert bank_tile(6144, 3, tile=8) == 8          # the stereo bank
    assert bank_tile(9216, 3, tile=8) == 8          # decoupled-geometry bank
    assert bank_tile(9216, 3, tile=16) == 8         # 10.6 MB at 16: halves once
    assert bank_tile(12288, 16, tile=8) == 0        # too big at the tile floor
    assert not bank_supported(12288, 16, tile=8)
    assert bank_tile(6144, 64, tile=8) == 0
    assert not bank_supported(6144, 64, tile=8)
    assert not bank_supported(100, 2, tile=8)       # unfactorable chunk
