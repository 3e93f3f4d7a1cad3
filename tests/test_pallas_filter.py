"""Fused Pallas generation kernel (ops/pallas_filter.py).

Runs in Pallas interpret mode on CPU; statistical properties must match the
XLA Threefry path (the streams differ by construction).
"""

import numpy as np
import pytest

from pods_digital_filter_tpu.ops import filters, pallas_filter as pf


def _gen(seed=0, t0=0, nsteps=32, jma=24, kma=16, nf=3, ln=1.5):
    return np.asarray(pf.generate_correlated_noise_fused(
        seed, t0, nsteps, jma, kma, nf, nf, nf, ln, ln, ln,
        num_components=3, interpret=True))


def test_shapes_and_finite():
    y = _gen()
    assert y.shape == (3, 32, 24, 16)
    assert np.isfinite(y).all()


def test_unit_variance_and_zero_mean():
    """Normalized taps preserve unit variance of the +/-sqrt(3) noise
    (digitalfilters.py:73-89 normalization; oracle property shared with the
    XLA path)."""
    y = _gen(nsteps=64, jma=32, kma=32)
    var = y.var()
    assert abs(var - 1.0) < 0.15, var
    assert abs(y.mean()) < 0.05


def test_spatial_correlation_matches_taps():
    """Adjacent-z correlation equals the tap autocorrelation sum(b[i]b[i+1])
    — same closed form the XLA path satisfies."""
    nf, ln = 4, 2.0
    y = _gen(nsteps=48, jma=32, kma=48, nf=nf, ln=ln)
    b = np.asarray(filters.gaussian_fir_coeffs(nf, ln, np.float32))
    expected = float((b[:-1] * b[1:]).sum())
    prod = (y[..., :-1] * y[..., 1:]).mean() / y.var()
    assert abs(prod - expected) < 0.1, (prod, expected)


def test_components_decorrelated():
    y = _gen(nsteps=48, jma=32, kma=32)
    c01 = np.corrcoef(y[0].ravel(), y[1].ravel())[0, 1]
    c02 = np.corrcoef(y[0].ravel(), y[2].ravel())[0, 1]
    assert abs(c01) < 0.05 and abs(c02) < 0.05


def test_gemm_layout_parity_with_xla_path():
    """Given identical raw noise, the pallas GEMM kernel must equal
    filters.filter_spatial exactly (the contraction layout is the part the
    kernel can get wrong)."""
    import jax
    import jax.numpy as jnp

    seed, t0, nsteps, jma, kma, nf, ln = 3, 5, 8, 24, 16, 2, 1.0
    y = _gen(seed=seed, t0=t0, nsteps=nsteps, jma=jma, kma=kma, nf=nf, ln=ln)

    # reconstruct the raw noise the interpret path draws internally
    num_slabs = nsteps + 2 * nf
    jn, kn = jma + 2 * nf, kma + 2 * nf
    key = jax.random.fold_in(jax.random.key(seed), t0)
    raw = jax.random.uniform(key, (3 * num_slabs, jn, kn), jnp.float32,
                             -np.sqrt(3.0), np.sqrt(3.0))
    raw = raw.reshape(3, num_slabs, jn, kn)
    by = filters.gaussian_fir_coeffs(nf, ln, jnp.float32)
    z = filters.filter_spatial(raw, by, by, jma, kma)
    bx = filters.gaussian_fir_coeffs(nf, ln, jnp.float32)
    expected = np.asarray(filters.filter_temporal(z, bx, axis=-3))
    np.testing.assert_allclose(y, expected, atol=2e-5)


@pytest.mark.skipif(True, reason="on-core PRNG exists only on real TPU; "
                    "covered by the TPU bench/verify runs")
def test_blockwise_consistent_with_full_tpu_only():
    full = _gen(seed=7, t0=0, nsteps=16, jma=12, kma=8, nf=2, ln=1.0)
    block = _gen(seed=7, t0=8, nsteps=8, jma=12, kma=8, nf=2, ln=1.0)
    np.testing.assert_allclose(block, full[:, 8:], atol=1e-6)


def test_vmem_guard_falls_back():
    assert not pf.fused_spatial_available(4096, 4096, 8, 8)
    assert pf.fused_spatial_available(512, 512, 8, 8)
