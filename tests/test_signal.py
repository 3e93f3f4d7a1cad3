"""Signal library: Welch PSD conventions, Parseval consistency, coherence."""

import numpy as np
import pytest

from pods_digital_filter_tpu.ops import signal


def test_welch_pure_tone():
    fs, N = 100.0, 256
    t = np.arange(4 * N) / fs
    f0 = 12.5
    x = np.sqrt(2.0) * np.cos(2 * np.pi * f0 * t)
    f, Sxx, M = signal.welch_psd(x, fs, N, iwindow=1)
    Sxx = np.asarray(Sxx)
    assert M == 1 + (x.size - N) // (N // 2)
    # two-sided PSD integrates to the variance (Parseval)
    df = fs / N
    np.testing.assert_allclose(np.sum(Sxx) * df, np.var(x), rtol=0.05)
    # peak at +-f0
    peaks = np.asarray(f)[np.argsort(Sxx)[-2:]]
    np.testing.assert_allclose(sorted(np.abs(peaks)), [f0, f0], atol=df)


def test_welch_windows():
    fs, N = 10.0, 64
    x = np.random.default_rng(0).standard_normal(256)
    for iwindow in (1, 2, 3):
        f, Sxx, _ = signal.welch_psd(x, fs, N, iwindow)
        df = fs / N
        # corrective factor keeps broadband level right for any window
        np.testing.assert_allclose(np.sum(np.asarray(Sxx)) * df, np.var(x),
                                   rtol=0.35)


def test_block_size_check():
    with pytest.raises(ValueError):
        signal.welch_psd(np.zeros(10), 1.0, 16)


def test_coherence_of_identical_signals():
    x = np.random.default_rng(1).standard_normal(512)
    f, coh, M, _ = signal.coherence(x, x, 1.0, 64)
    np.testing.assert_allclose(np.asarray(coh).real, 1.0, atol=1e-8)


def test_transfer_function_of_scaled_signal():
    x = np.random.default_rng(2).standard_normal(512)
    f, H, M = signal.transfer_function(x, 3.0 * x, 1.0, 64)
    np.testing.assert_allclose(np.asarray(H).real, 3.0, atol=1e-6)


def test_cross_correlation_peak_at_lag():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1024)
    lag = 5
    y = np.roll(x, lag)
    lags, R, M = signal.cross_correlation(y, x, 1.0, 128)
    R = np.asarray(R).real
    assert lags[np.argmax(R)] == pytest.approx(lag)


def test_mean_dim_convention(rng):
    m = rng.standard_normal((4, 6))
    np.testing.assert_allclose(np.asarray(signal.mean(m, 1)), m.mean(axis=1))
    np.testing.assert_allclose(np.asarray(signal.mean(m, 0)), m.mean(axis=0))
    np.testing.assert_allclose(float(signal.mean(m[0])), m[0].mean())


def test_azimuthal_fourier_series_single_mode():
    """A field u(theta) = cos(m0*theta) on one ring must put its energy in
    azimuthal mode m0."""
    aziseg = 32
    theta = np.linspace(0.0, 2 * np.pi, aziseg, endpoint=False)
    m0 = 3
    npts = 1 + aziseg  # axis point + one ring (axiseg=1, rseg=1)
    u = np.zeros((npts, 1))
    u[1:, 0] = np.cos(m0 * theta)
    r = np.concatenate([[0.0], np.ones(aziseg)])
    th = np.concatenate([[0.0], theta])
    x = np.zeros(npts)
    m_array, x_arr, r_arr = signal.azimuthal_fourier_series(
        u, r, th, x, nc=1, axiseg=1, rseg=1, aziseg=aziseg)
    energies = m_array[0, 0, 0, :]
    # a real cos(m0*theta) splits its energy equally between n=m0 and its
    # alias n=aziseg-m0 (the DFT runs over n in [0, aziseg)); accept either
    top2 = set(np.argsort(energies)[-2:].tolist())
    assert top2 == {m0, aziseg - m0}


def test_azimuthal_fourier_series_matches_loop_oracle(rng):
    """The batched-einsum azimuthal DFT must agree with the reference-faithful
    host-loop implementation on a multi-ring, multi-component field with
    nonuniform azimuthal sampling."""
    axiseg, rseg, aziseg, nc = 3, 4, 17, 3
    npts = axiseg * (rseg * aziseg + 1) + 1
    u = rng.standard_normal((npts, nc))
    # nonuniform, per-ring theta samples (sorted, within [0, 2pi))
    theta = rng.uniform(0.0, 2 * np.pi, npts)
    from pods_digital_filter_tpu.ops.signal import _ring_index
    idx = _ring_index(axiseg, rseg, aziseg)
    theta[idx] = np.sort(theta[idx], axis=-1)
    r = rng.uniform(0.1, 1.0, npts)
    x = rng.standard_normal(npts)

    m_v, x_v, r_v = signal.azimuthal_fourier_series(
        u, r, theta, x, nc=nc, axiseg=axiseg, rseg=rseg, aziseg=aziseg)
    m_l, x_l, r_l = signal.azimuthal_fourier_series_loop(
        u, r, theta, x, nc=nc, axiseg=axiseg, rseg=rseg, aziseg=aziseg)

    np.testing.assert_allclose(m_v, m_l, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(x_v, x_l)
    np.testing.assert_array_equal(r_v, r_l)
