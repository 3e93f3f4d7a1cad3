"""Fourier-series compression: FFT == direct shifted DFT, selection
semantics, reconstruction parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from pods_digital_filter_tpu.ops import fourier

from oracle import reconstruct_series, shifted_dft


@pytest.mark.parametrize("ns", [16, 17, 50, 51])
def test_fft_matches_direct_dft(rng, ns):
    y = rng.standard_normal((ns, 3))
    c = np.asarray(fourier.fourier_coeff_matrix(jnp.asarray(y)))
    for i in range(3):
        np.testing.assert_allclose(c[:, i], shifted_dft(y[:, i]),
                                   rtol=1e-8, atol=1e-10)


def test_rank_tie_break():
    cmod = np.array([1.0, 3.0, 3.0, 0.5])
    idx = fourier.rank_coefficients(cmod)
    # |c| descending; ties broken by larger index first (reference sorted(),
    # PODFS.py:1577-1584)
    np.testing.assert_array_equal(idx, [2, 1, 0, 3])


def test_select_by_energy():
    cmod_sorted = np.array([5.0, 3.0, 1.0, 1.0])
    assert fourier.select_by_energy(cmod_sorted, 0.5) == 1     # 5 >= 5.0
    assert fourier.select_by_energy(cmod_sorted, 0.8) == 2     # 8 >= 8.0
    assert fourier.select_by_energy(cmod_sorted, 0.81) == 3
    assert fourier.select_by_energy(cmod_sorted, 1.0) == 4
    assert fourier.select_by_energy(cmod_sorted, 0.0) == 0     # strict while


def test_compress_and_reconstruct(rng):
    ns, nm = 40, 4
    t = np.arange(ns)
    y = np.stack([np.sin(2 * np.pi * (i + 1) * t / ns) + 0.1 * rng.standard_normal(ns)
                  for i in range(nm)], axis=1)
    fr = fourier.fourier_compress(y, nm, dt=0.01, energy_target=0.95)
    assert fr.period == pytest.approx(0.4)
    for i in range(nm):
        ks = fr.wavenumbers(i)
        cs = fr.kept_coeffs(i)
        want = reconstruct_series(cs, ks, ns)
        np.testing.assert_allclose(fr.reconstruction[:, i], want,
                                   rtol=1e-6, atol=1e-8)
        # energy criterion satisfied
        cmod = np.abs(fr.coeffs[:, i])
        kept = np.abs(cs).sum()
        assert kept >= 0.95 * cmod.sum() - 1e-9


def test_pure_tone_needs_two_coeffs(rng):
    ns = 32
    t = np.arange(ns)
    y = np.cos(2 * np.pi * 3 * t / ns)[:, None]
    fr = fourier.fourier_compress(y, 1, dt=1.0, energy_target=0.99)
    assert fr.counts[0] == 2               # +/-3 conjugate pair
    np.testing.assert_allclose(sorted(fr.wavenumbers(0)), [-3, 3])
    np.testing.assert_allclose(fr.reconstruction[:, 0], y[:, 0], atol=1e-6)
