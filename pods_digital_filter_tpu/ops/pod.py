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


def gram_matrix(A: jax.Array, cell_weights=None) -> jax.Array:
    """``C = A^T A / Ns`` for the snapshot matrix ``A`` of shape
    ``(num_components*num_points, num_snapshots)``.

    ``cell_weights`` (optional, shape ``(num_points,)``) reproduces the
    reference's cell-volume-weighted correlation
    (``correct_for_cell_volumes``, PODFS.py:1456-1464): each point row is
    weighted by its cell volume/area, tiled across components.
    """
    ns = A.shape[1]
    if cell_weights is not None:
        w = jnp.asarray(cell_weights, dtype=A.dtype)
        ncomp = A.shape[0] // w.shape[0]
        wfull = jnp.tile(w, ncomp)[:, None]
        Aw = A * wfull
        return jnp.dot(Aw.T, A, preferred_element_type=A.dtype) / ns
    return jnp.dot(A.T, A, preferred_element_type=A.dtype) / ns


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


@jax.jit
def _eigh_desc(C: jax.Array):
    e, v = jnp.linalg.eigh(C)
    return e[::-1], v[:, ::-1]


@jax.jit
def _spatial_modes(A: jax.Array, T_scaled: jax.Array, energy: jax.Array):
    """``Phi = A @ T @ diag(1/lambda) / Ns`` (PODFS.py:1329-1333)."""
    ns = A.shape[1]
    M = T_scaled * (1.0 / energy)[None, :]
    return jnp.dot(A, M, preferred_element_type=A.dtype) / ns


def snapshot_pod(
    A: jax.Array,
    num_modes_trunc: int,
    tol_cn: float = 1.0e-15,
    cell_weights=None,
) -> PODResult:
    """Full snapshot POD of ``A`` (shape ``(3*Np, Ns)``, mean already removed).

    Device work: Gram matrix, eigh, the two big matmuls.  Host work: the tiny
    O(Ns) bookkeeping (valid-mode count, truncation) that requires concrete
    values.
    """
    ns = A.shape[1]
    C = gram_matrix(A, cell_weights)
    e_desc, v_desc = _eigh_desc(C)
    energy = np.asarray(e_desc, dtype=np.float64)
    vecs = np.asarray(v_desc, dtype=np.float64)
    energy, vecs = sort_eigenvalues_desc(energy, vecs)

    num_valid = count_valid_modes(energy, tol_cn)
    if num_modes_trunc < 0 or num_modes_trunc > num_valid:
        num_modes_trunc = num_valid

    # Temporal-mode scaling (PODFS.py:1322-1325): scale each valid column so
    # its mean square equals its eigenvalue.
    temporal = vecs.copy()
    for j in range(num_valid):
        mag = np.sum(temporal[:, j] * temporal[:, j]) / ns
        if mag > 0:
            temporal[:, j] = temporal[:, j] * np.sqrt(max(energy[j], 0.0) / mag)

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
