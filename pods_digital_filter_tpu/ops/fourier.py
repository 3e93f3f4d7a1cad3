"""Per-mode Fourier-series compression of POD temporal coefficients.

Reference: ``fourier_coefficients`` (PODFS.py:1523-1659) computes, for each
POD mode, the direct DFT

    c[n] = (1/Ns) * sum_t y(t) * exp(-i*2*pi*(n - Ns//2)*t_idx/Ns)

as an O(Ns^2) Python loop, ranks coefficients by magnitude, and keeps the
smallest set whose magnitude sum reaches ``et * sum|c|``.

Here the whole coefficient matrix for all modes is one batched FFT:
``c = fftshift(fft(y, axis=0), axes=0) / Ns`` is exactly the reference's
shifted-index DFT for both even and odd Ns (the reference's ``k = n - Ns/2``
uses Python-2 floor division, which coincides with numpy's fftshift center).
The reconstruction check uses the masked inverse FFT.  The O(Ns log Ns)
ranking/selection is host-side numpy (tiny).

The FFT itself runs on the HOST (pocketfft): the coefficient matrix is
``(Ns, nm)`` — a few MB at most, milliseconds either way — while a device
FFT dispatch must WAIT for whatever already occupies the device queue; in
the round-5 flagship that was the ~35 s full-spectrum Lanczos scan
running under the export stages, and the queued device FFT serialized the
whole tail behind it (measured +35 s).  Host numpy is also the
reference's own arithmetic (PODFS.py:1562-1573 runs numpy complex math).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def fourier_coeff_matrix(temporal_modes) -> np.ndarray:
    """``c[n, i]`` for all modes at once: shape ``(Ns, nm)`` complex (host).

    ``temporal_modes`` is ``(Ns, nm)`` real.  Equivalent to the reference's
    per-(mode, frequency) double loop (PODFS.py:1562-1573) — one batched FFT.
    """
    y = np.asarray(temporal_modes, dtype=np.float64)
    return np.fft.fftshift(np.fft.fft(y, axis=0), axes=0) / y.shape[0]


def reconstruct_from_coeffs(c_masked) -> np.ndarray:
    """Inverse of :func:`fourier_coeff_matrix` with unselected coefficients
    zeroed — the reference's reconstruction check ``y2`` (PODFS.py:1602-1612)."""
    c = np.asarray(c_masked)
    ns = c.shape[0]
    return np.real(np.fft.ifft(np.fft.ifftshift(c, axes=0), axis=0)) * ns


def rank_coefficients(cmod: np.ndarray) -> np.ndarray:
    """Indices sorted by |c| descending, ties broken by larger index first —
    the exact ordering of the reference's ``sorted(zip(cmod, ind),
    reverse=True)`` (PODFS.py:1577-1584)."""
    n = cmod.shape[0]
    ind = np.arange(n)
    return ind[np.lexsort((-ind, -cmod))]


def select_by_energy(cmod_sorted: np.ndarray, energy_target: float) -> int:
    """Smallest count with cumulative |c| >= et * total |c| (PODFS.py:1587-1593).
    The reference's strict ``while energy < target`` loop always takes at
    least one coefficient."""
    total = cmod_sorted.sum()
    target = total * energy_target
    if not target > 0.0:
        return 0  # strict `while energy < target` never entered
    csum = np.cumsum(cmod_sorted)
    count = int(np.searchsorted(csum, target, side="left")) + 1
    return min(count, cmod_sorted.shape[0])


@dataclass
class FourierResult:
    period: float
    coeffs: np.ndarray        # (Ns, nm) complex — full shifted-DFT matrix
    counts: np.ndarray        # (nm,) int — coefficients kept per mode
    order: np.ndarray         # (nm, Ns) int — per-mode magnitude-descending index order
    reconstruction: np.ndarray  # (Ns, nm) real — truncated-series reconstruction

    @property
    def num_modes(self) -> int:
        return self.coeffs.shape[1]

    def wavenumbers(self, mode: int) -> np.ndarray:
        """Integer frequencies ``k = n - Ns//2`` for the kept coefficients of
        ``mode``, in the ranked order they are written to PODFS.dat."""
        ns = self.coeffs.shape[0]
        sel = self.order[mode, : self.counts[mode]]
        return sel - ns // 2

    def kept_coeffs(self, mode: int) -> np.ndarray:
        sel = self.order[mode, : self.counts[mode]]
        return self.coeffs[sel, mode]

    def packed_fc(self) -> np.ndarray:
        """(sum(counts), 3) array of [k, Re, Im] rows in mode-major order —
        the HDF5 ``FC`` dataset layout (HDF5.py:27-29)."""
        rows = []
        for i in range(self.num_modes):
            ks = self.wavenumbers(i)
            cs = self.kept_coeffs(i)
            rows.append(np.stack([ks.astype(np.float64), cs.real, cs.imag], axis=1))
        if rows:
            return np.concatenate(rows, axis=0)
        return np.zeros((0, 3), dtype=np.float64)


def fourier_compress(
    temporal_modes: np.ndarray,  # (Ns, >=nm) scaled POD temporal modes
    num_modes: int,
    dt: float,
    energy_target: float,
) -> FourierResult:
    """Compress the first ``num_modes`` temporal modes.

    Period is ``Ns * dt`` (PODFS.py:1540-1542: ``time[-1] + dt``).
    """
    ns = temporal_modes.shape[0]
    period = float(ns * dt)
    c = fourier_coeff_matrix(temporal_modes[:, :num_modes])

    counts = np.zeros(num_modes, dtype=np.int64)
    order = np.zeros((num_modes, ns), dtype=np.int64)
    mask = np.zeros((ns, num_modes), dtype=bool)
    for i in range(num_modes):
        cmod = np.abs(c[:, i])
        idx = rank_coefficients(cmod)
        order[i] = idx
        counts[i] = select_by_energy(cmod[idx], energy_target)
        mask[idx[: counts[i]], i] = True

    y2 = reconstruct_from_coeffs(np.where(mask, c, 0.0))

    return FourierResult(
        period=period, coeffs=c, counts=counts, order=order, reconstruction=y2
    )
