"""Snapshot POD (Proper Orthogonal Decomposition).

Reference: ``POD`` (PODFS.py:1294-1393) with

* Gram/correlation matrix ``C = A^T A / Ns``
  (``calculate_correlation_matrix``, PODFS.py:1451-1464) — the O(Ns^2 * 3Np)
  hot spot, here one MXU contraction; when ``A`` carries a ``NamedSharding``
  over the point axis, XLA lowers it to per-shard Gram products + an
  all-reduce over the mesh (the ``psum`` of the dead-MPI design, §2.3 of the
  reference survey);
* eigendecomposition: the reference calls the general nonsymmetric
  ``linalg.eig`` (PODFS.py:1309) on a symmetric matrix — we use ``eigh``
  (symmetric solver: faster, real eigenpairs by construction, identical
  spectrum; deliberate documented deviation).  Eigenvector signs are
  arbitrary in both, and the PODFS replay is sign-invariant;
* NaN-robust descending sort (``sort_eigenvalues``, PODFS.py:1430-1447);
* valid-mode count by condition-number tolerance (PODFS.py:1312-1318),
  replicated loop-for-loop including its step-by-two quirk;
* temporal-mode scaling to ``sqrt(lambda_j / <a_j^2>)`` (PODFS.py:1322-1325);
* truncated spatial modes ``Phi = A @ T[:, :m] @ diag(1/lambda) / Ns``
  (PODFS.py:1329-1333).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _gram_jit(A: jax.Array) -> jax.Array:
    ns = A.shape[1]
    return jnp.dot(A.T, A, preferred_element_type=A.dtype) / ns


@jax.jit
def _gram_weighted_jit(A: jax.Array, w: jax.Array) -> jax.Array:
    ns = A.shape[1]
    ncomp = A.shape[0] // w.shape[0]
    Aw = A * jnp.tile(w, ncomp)[:, None]
    return jnp.dot(Aw.T, A, preferred_element_type=A.dtype) / ns


def gram_matrix(A: jax.Array, cell_weights=None) -> jax.Array:
    """``C = A^T A / Ns`` for the snapshot matrix ``A`` of shape
    ``(num_components*num_points, num_snapshots)``.

    ``cell_weights`` (optional, shape ``(num_points,)``) reproduces the
    reference's cell-volume-weighted correlation
    (``correct_for_cell_volumes``, PODFS.py:1456-1464): each point row is
    weighted by its cell volume/area, tiled across components.

    Jitted with array *arguments* (framework rule: eager dispatch and
    closure constants both take pathological first-call paths on the
    remote-compile TPU service; jitted argument-passing programs hit the
    persistent compile cache).
    """
    if cell_weights is not None:
        return _gram_weighted_jit(A, jnp.asarray(cell_weights, dtype=A.dtype))
    return _gram_jit(A)


@jax.jit
def center_and_gram(A: jax.Array):
    """One fused device program for the POD front half: column mean,
    centered matrix, Gram.  Returns ``(mean, Ac, C)``."""
    ns = A.shape[1]
    mean = jnp.mean(A, axis=1)
    Ac = A - mean[:, None]
    C = jnp.dot(Ac.T, Ac, preferred_element_type=A.dtype) / ns
    return mean, Ac, C


def count_valid_modes(energy: np.ndarray, tol_cn: float) -> int:
    """Faithful replica of the reference's valid-mode loop (PODFS.py:1312-1318),
    including the double-increment structure (it affects the result only via
    the Ns-2 cap interplay)."""
    ns = energy.shape[0]
    tol2 = math.pow(tol_cn, 2.0)
    e0 = energy[0].real
    nv = 0
    while (energy[nv].real / e0 > tol2) and (nv < ns - 2) and (energy[nv].real > 0.0):
        nv += 1
        if (energy[nv].real / e0 > tol2) and (energy[nv].real > 0.0):
            nv += 1
    return nv


def sort_eigenvalues_desc(energy: np.ndarray, vectors: np.ndarray):
    """Descending real-part sort with the reference's NaN handling
    (PODFS.py:1430-1447): NaN eigenvalues become -1e10 with zeroed vectors."""
    e = energy.real.copy().astype(np.float64)
    v = vectors.real.copy()
    nan_mask = ~np.isfinite(energy.real) | ~np.isfinite(np.imag(np.asarray(energy, dtype=complex)))
    e[nan_mask] = -1.0e10
    v[:, nan_mask] = 0.0
    order = np.argsort(-e, kind="stable")
    return e[order], v[:, order]


@dataclass
class PODResult:
    energy: np.ndarray           # (Ns,) eigenvalues, descending
    temporal_modes: np.ndarray   # (Ns, Ns); first num_valid columns scaled
    spatial_modes: np.ndarray    # (3*Np, num_trunc)
    num_valid: int
    num_trunc: int


def eigh_desc(C) -> tuple:
    """Descending symmetric eigendecomposition of the Gram matrix — always
    host float64.  The Ns x Ns eigh is the one dense non-MXU stage: LAPACK
    dsyevd on the host wins at every size that fits in RAM (the TPU eigh
    lowering is Jacobi sweeps — many tiny kernels, pure overhead through a
    remote-dispatch tunnel, and at Ns >= 10k it crashes this backend's
    compile helper outright — measured in benchmarks/bench_flagship.py:
    10240 x 10240 in ~100 s host fp64).  The device keeps the O(Np*Ns^2)
    matmuls either side; host fp64 also improves spectral parity with the
    reference's np.linalg.eig (PODFS.py:1309).  Returns (energy, vectors)."""
    Ch = np.asarray(C, dtype=np.float64)
    e, v = np.linalg.eigh((Ch + Ch.T) * 0.5)
    return e[::-1], v[:, ::-1]


@jax.jit
def _spatial_modes(A: jax.Array, T_scaled: jax.Array, energy: jax.Array):
    """``Phi = A @ T @ diag(1/lambda) / Ns`` (PODFS.py:1329-1333)."""
    ns = A.shape[1]
    M = T_scaled * (1.0 / energy)[None, :]
    return jnp.dot(A, M, preferred_element_type=A.dtype) / ns


def temporal_from_gram(C, ns: int, num_modes_trunc: int, tol_cn: float):
    """The eigen half of snapshot POD: Gram matrix -> sorted eigenvalues,
    valid-mode count, and reference-scaled temporal modes
    (PODFS.py:1309-1325).  Host numpy outputs; shared by the in-memory and
    the out-of-core (streaming) POD paths."""
    energy, vecs = eigh_desc(C)
    energy, vecs = sort_eigenvalues_desc(energy, vecs)

    num_valid = count_valid_modes(energy, tol_cn)
    if num_modes_trunc < 0 or num_modes_trunc > num_valid:
        num_modes_trunc = num_valid

    # Temporal-mode scaling (PODFS.py:1322-1325): scale each valid column so
    # its mean square equals its eigenvalue (vectorized — one fused pass
    # instead of Ns strided-column operations).
    temporal = vecs.copy()
    mag = np.einsum("ij,ij->j", temporal[:, :num_valid],
                    temporal[:, :num_valid]) / ns
    scale = np.where(mag > 0,
                     np.sqrt(np.maximum(energy[:num_valid], 0.0)
                             / np.where(mag > 0, mag, 1.0)), 1.0)
    temporal[:, :num_valid] *= scale[None, :]
    return energy, temporal, num_valid, num_modes_trunc


def snapshot_pod(
    A: jax.Array,
    num_modes_trunc: int,
    tol_cn: float = 1.0e-15,
    cell_weights=None,
    gram=None,
) -> PODResult:
    """Full snapshot POD of ``A`` (shape ``(3*Np, Ns)``, mean already removed).

    Device work: Gram matrix, the two big matmuls.  Host work: the small
    eigendecomposition (see :func:`eigh_desc`) and the tiny O(Ns)
    bookkeeping that requires concrete values.  ``gram`` lets callers pass a
    precomputed C (e.g. from :func:`center_and_gram`).
    """
    ns = A.shape[1]
    C = gram_matrix(A, cell_weights) if gram is None else gram
    energy, temporal, num_valid, num_modes_trunc = temporal_from_gram(
        C, ns, num_modes_trunc, tol_cn)

    T_scaled = jnp.asarray(temporal[:, :num_modes_trunc], dtype=A.dtype)
    lam = jnp.asarray(energy[:num_modes_trunc], dtype=A.dtype)
    phi = np.asarray(_spatial_modes(A, T_scaled, lam))

    return PODResult(
        energy=energy,
        temporal_modes=temporal,
        spatial_modes=phi,
        num_valid=num_valid,
        num_trunc=num_modes_trunc,
    )
