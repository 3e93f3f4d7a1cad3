"""Off-hot-path matplotlib diagnostics (replaces nplotlib.py's main-path
functions: ``contourf``, ``timeseries``, ``PSD``, ``eigs``; nplotlib.py:84,
140, 393, 465).  Agg backend, PNG output."""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def contourf(y, z, field, title: str, path: str, levels: int = 100, figsize=None):
    fig, ax = plt.subplots(figsize=figsize)
    cs = ax.contourf(y, z, field, levels, cmap="jet")
    fig.colorbar(cs, ax=ax)
    ax.set_xlabel("y")
    ax.set_ylabel("z")
    ax.set_title(title)
    ax.set_aspect("equal")
    fig.savefig(path + ".png", dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path + ".png"


def timeseries(t, y, path: str, label: str = ""):
    fig, ax = plt.subplots()
    ax.plot(t, y)
    ax.set_xlabel("time")
    ax.set_ylabel(label)
    fig.savefig(path + ".png", dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path + ".png"


def psd(freqs, Sxx, path: str, label: str = "Power"):
    fig, ax = plt.subplots()
    ax.loglog(np.asarray(freqs)[freqs > 0], np.asarray(Sxx)[freqs > 0])
    ax.set_xlabel("frequency [Hz]")
    ax.set_ylabel(label)
    fig.savefig(path + ".png", dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path + ".png"


def eigen_spectrum(energy, path: str):
    fig, ax = plt.subplots()
    e = np.asarray(energy)
    ax.semilogy(np.arange(1, len(e) + 1), np.maximum(e, 1e-300), "o-")
    ax.set_xlabel("mode")
    ax.set_ylabel(r"$\lambda$")
    fig.savefig(path + ".png", dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path + ".png"


def wns(k, E, path: str, label: str = "E(k)"):
    """Wavenumber spectrum with the Kolmogorov -5/3 slope overlay
    (reference ``WNS``, nplotlib.py:415-441)."""
    k = np.asarray(k)
    E = np.asarray(E)
    sel = k > 0
    fig, ax = plt.subplots()
    ax.loglog(k[sel], E[sel], label=label)
    if sel.any() and E[sel].max() > 0:
        k0 = k[sel][max(1, sel.sum() // 8)]
        E0 = np.interp(k0, k[sel], E[sel])
        kk = k[sel]
        ax.loglog(kk, E0 * (kk / k0) ** (-5.0 / 3.0), "k--",
                  label=r"$k^{-5/3}$")
    ax.set_xlabel("wavenumber k")
    ax.set_ylabel(label)
    ax.legend()
    fig.savefig(path + ".png", dpi=200, bbox_inches="tight")
    plt.close(fig)
    return path + ".png"


def pod_diagnostics(outdir: str, pod_result, fourier_result, dt: float):
    """Verbose-mode diagnostic bundle: per-mode PSDs (reference
    PODFS.py:1366-1386) and temporal-mode reconstruction overlays
    (``POD_tmode_recon<i>.png``, PODFS.py:1614-1623)."""
    from pods_digital_filter_tpu.ops.signal import welch_psd

    ns = pod_result.temporal_modes.shape[0]
    t = np.arange(ns) * dt
    paths = []
    paths.append(eigen_spectrum(pod_result.energy[: pod_result.num_valid],
                                os.path.join(outdir, "POD_mode_energies")))
    for j in range(pod_result.num_trunc):
        y = pod_result.temporal_modes[:, j].real
        fs, Sxx, _ = welch_psd(y, 1.0 / dt, ns, iwindow=1)
        paths.append(psd(np.asarray(fs), np.asarray(Sxx),
                         os.path.join(outdir, f"POD_PSD_mode_{j}")))
        # reconstruction overlay
        fig, ax = plt.subplots()
        ax.plot(t, y, label="original")
        ax.plot(t, fourier_result.reconstruction[:, j], "--", label="fourier")
        ax.legend()
        fig.savefig(os.path.join(outdir, f"POD_tmode_recon{j}.png"),
                    dpi=200, bbox_inches="tight")
        plt.close(fig)
    return paths
