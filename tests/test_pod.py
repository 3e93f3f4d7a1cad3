"""Snapshot POD: orthogonality, energy accounting, oracle parity, valid-mode
counting quirks."""

import jax.numpy as jnp
import numpy as np

from pods_digital_filter_tpu.ops import pod

from oracle import pod_oracle


def _toy_snapshots(rng, npts=60, ns=25, rank=6):
    """Low-rank + noise snapshot matrix, mean removed."""
    U = rng.standard_normal((npts, rank))
    t = np.arange(ns)
    T = np.stack([np.sin(2 * np.pi * (i + 1) * t / ns + i) * (rank - i)
                  for i in range(rank)], axis=1)
    A = U @ T.T + 0.01 * rng.standard_normal((npts, ns))
    return A - A.mean(axis=1, keepdims=True)


def test_eigenvalue_sum_is_total_energy(rng):
    A = _toy_snapshots(rng)
    res = pod.snapshot_pod(jnp.asarray(A), num_modes_trunc=-1)
    total = np.sum(A * A) / A.shape[1]
    np.testing.assert_allclose(res.energy.sum(), total, rtol=1e-8)


def test_spatial_modes_orthonormal(rng):
    A = _toy_snapshots(rng)
    res = pod.snapshot_pod(jnp.asarray(A), num_modes_trunc=6)
    phi = res.spatial_modes
    G = phi.T @ phi
    np.testing.assert_allclose(G, np.eye(G.shape[0]), atol=1e-6)


def test_temporal_mode_scaling(rng):
    """After scaling, <a_j^2> == lambda_j (PODFS.py:1322-1325)."""
    A = _toy_snapshots(rng)
    res = pod.snapshot_pod(jnp.asarray(A), num_modes_trunc=-1)
    ns = A.shape[1]
    for j in range(res.num_valid):
        msq = np.sum(res.temporal_modes[:, j] ** 2) / ns
        np.testing.assert_allclose(msq, res.energy[j], rtol=1e-8)


def test_reconstruction(rng):
    """A ~= Phi @ a^T when keeping all valid modes."""
    A = _toy_snapshots(rng)
    res = pod.snapshot_pod(jnp.asarray(A), num_modes_trunc=-1)
    recon = res.spatial_modes @ res.temporal_modes[:, :res.num_trunc].T
    np.testing.assert_allclose(recon, A, atol=1e-6)


def test_oracle_parity(rng):
    """Eigenvalues and mode subspaces match the nonsymmetric-eig oracle
    (sign-invariant comparison)."""
    A = _toy_snapshots(rng)
    res = pod.snapshot_pod(jnp.asarray(A), num_modes_trunc=6)
    lam_o, T_o, phi_o, nv_o, m_o = pod_oracle(A, 6)
    np.testing.assert_allclose(res.energy[:10], lam_o[:10], rtol=1e-7, atol=1e-10)
    assert res.num_trunc == m_o
    for j in range(6):
        dot = abs(np.dot(res.spatial_modes[:, j], phi_o[:, j]))
        norm = np.linalg.norm(res.spatial_modes[:, j]) * np.linalg.norm(phi_o[:, j])
        np.testing.assert_allclose(dot / norm, 1.0, atol=1e-6)


def test_count_valid_modes_reference_loop():
    tol = 1e-3  # tol^2 = 1e-6
    e = np.array([1.0, 0.5, 1e-5, 1e-9, 1e-12])
    # modes 0,1,2 exceed 1e-6 * e0; 3,4 don't
    assert pod.count_valid_modes(e, tol) == 3
    # all valid -> capped by the reference's ns-2 outer check interacting
    # with the double increment (trace of PODFS.py:1312-1318 for ns=6)
    e = np.ones(6)
    assert pod.count_valid_modes(e, tol) == 4
    # negative energy stops the count
    e = np.array([1.0, -0.1, 0.05])
    assert pod.count_valid_modes(e, tol) == 1


def test_gram_cell_weights(rng):
    A = rng.standard_normal((6 * 4, 5))
    w = rng.uniform(0.5, 2.0, 4)
    C = np.asarray(pod.gram_matrix(jnp.asarray(A), cell_weights=w))
    wfull = np.tile(w, 6)
    want = (A * wfull[:, None]).T @ A / 5
    np.testing.assert_allclose(C, want, rtol=1e-10)


def test_two_phase_eig_parity(rng):
    """eig_mode topk (eigvalsh spectrum + Lanczos/subset top-k vectors)
    must reproduce the full-eigh path: identical spectrum, identical
    valid-mode count, identical scaled temporal modes up to eigenvector
    sign (PODFS replay is sign-invariant)."""
    n, k = 300, 7
    B = rng.standard_normal((n, 40))
    C = (B @ B.T) / 40 + 1e-8 * np.eye(n)
    e_f, t_f, nv_f, nt_f = pod.temporal_from_gram(C, n, k, 1e-15)
    e_t, t_t, nv_t, nt_t = pod.temporal_from_gram(C, n, k, 1e-15,
                                                  num_vectors=k)
    assert t_f.shape == (n, n) and t_t.shape == (n, k)
    assert (nv_f, nt_f) == (nv_t, nt_t)
    np.testing.assert_allclose(e_t, e_f, rtol=1e-12, atol=1e-14)
    # per-column sign alignment, then exact agreement
    sign = np.sign(np.einsum("ij,ij->j", t_f[:, :k], t_t))
    np.testing.assert_allclose(t_t * sign[None, :], t_f[:, :k],
                               rtol=1e-8, atol=1e-10)


def test_two_phase_lanczos_branch(rng):
    """Force the Lanczos branch (n >= 2048) and check the top eigenpairs
    against LAPACK on a decaying-spectrum Gram."""
    n, k = 2200, 5
    B = rng.standard_normal((n, 32)) * np.exp(-0.2 * np.arange(32))
    C = (B @ B.T) / 32 + 1e-10 * np.eye(n)
    e_full, v_full = pod.eigh_desc(C)
    e_k, v_k = pod.eigh_desc_topk(C, k)
    np.testing.assert_allclose(e_k, e_full[:k], rtol=1e-10)
    overlap = np.abs(np.einsum("ij,ij->j", v_full[:, :k], v_k))
    np.testing.assert_allclose(overlap, 1.0, atol=1e-8)


def test_resolve_num_vectors():
    import dataclasses

    from pods_digital_filter_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    assert pod.resolve_num_vectors(cfg, 10240, 20) == 20          # auto+large
    assert pod.resolve_num_vectors(cfg, 100, 20) is None          # auto+small
    assert pod.resolve_num_vectors(
        dataclasses.replace(cfg, verbose=True), 10240, 20) is None
    assert pod.resolve_num_vectors(
        dataclasses.replace(cfg, eig_mode="full"), 10240, 20) is None
    assert pod.resolve_num_vectors(
        dataclasses.replace(cfg, eig_mode="topk"), 100, 20) == 20
    assert pod.resolve_num_vectors(cfg, 10240, -1) is None        # all modes
