"""Lund/Cholesky coloring: factorization correctness, clamping semantics,
statistical reproduction of target Reynolds stresses."""

import jax
import jax.numpy as jnp
import numpy as np

from pods_digital_filter_tpu.ops import filters, lund

from oracle import lund_point


def _factor_matrix(parts):
    a00, a10, a11, a20, a21, a22 = [np.asarray(p) for p in parts]
    A = np.zeros(np.shape(a00) + (3, 3))
    A[..., 0, 0] = a00
    A[..., 1, 0] = a10
    A[..., 1, 1] = a11
    A[..., 2, 0] = a20
    A[..., 2, 1] = a21
    A[..., 2, 2] = a22
    return A


def test_cholesky_reproduces_spd_stress(rng):
    """For SPD R, A @ A.T == R exactly."""
    L = rng.standard_normal((50, 3, 3))
    R = np.einsum("nij,nkj->nik", L, L) + 3.0 * np.eye(3)
    parts = lund.lund_cholesky(
        R[:, 0, 0], R[:, 1, 1], R[:, 2, 2], R[:, 0, 1], R[:, 0, 2], R[:, 1, 2])
    A = _factor_matrix(parts)
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", A, A), R,
                               rtol=1e-8, atol=1e-10)


def test_matches_reference_clamp_semantics(rng):
    """Element-for-element parity with the scalar reference-rule oracle,
    including degenerate/indefinite inputs."""
    cases = []
    for _ in range(200):
        uu, vv, ww = rng.uniform(-0.5, 2.0, 3)
        uv, uw, vw = rng.uniform(-1.0, 1.0, 3)
        cases.append((uu, vv, ww, uv, uw, vw))
    cases += [(0, 1, 1, 0.5, 0.5, 0.2), (1, 0, 1, 0, 0.5, 0.3),
              (1, 1, 0, 0.9, 0.9, 0.9), (0, 0, 0, 0, 0, 0)]
    arr = np.array(cases, dtype=np.float64)
    parts = lund.lund_cholesky(*[arr[:, i] for i in range(6)])
    A = _factor_matrix(parts)
    for n, c in enumerate(cases):
        np.testing.assert_allclose(A[n], lund_point(*c), rtol=1e-10, atol=1e-12,
                                   err_msg=str(c))


def test_apply_lund_adapt1d_layout():
    """adapt1d: per-k stats, mean enters u only (digitalfilters.py:143-178)."""
    jma, kma = 4, 5
    xu = jnp.ones((jma, kma))
    xv = 2.0 * jnp.ones((jma, kma))
    xw = 3.0 * jnp.ones((jma, kma))
    uu = jnp.asarray(np.full(kma, 4.0))
    vv = jnp.asarray(np.full(kma, 9.0))
    ww = jnp.asarray(np.full(kma, 16.0))
    zero = jnp.zeros(kma)
    U = jnp.asarray(np.linspace(1.0, 2.0, kma))
    u, v, w = lund.apply_lund(xu, xv, xw, uu, vv, ww, zero, zero, zero, U, 0.0, 0.0)
    np.testing.assert_allclose(
        np.asarray(u),
        np.broadcast_to(2.0 * 1.0 + np.asarray(U)[None, :], (jma, kma)))
    np.testing.assert_allclose(np.asarray(v), 3.0 * 2.0)
    np.testing.assert_allclose(np.asarray(w), 4.0 * 3.0)


def test_colored_noise_statistics():
    """End-to-end: filtered noise colored with an anisotropic stress tensor
    reproduces the target Reynolds stresses (SURVEY.md §4 closed-form check)."""
    jma, kma, nsteps = 24, 24, 600
    nf, ln = 4, 2.0
    key = jax.random.key(42)
    noise = filters.generate_correlated_noise(
        key, 0, nsteps, jma, kma, nf, nf, nf, ln, ln, ln,
        num_components=3, dtype=jnp.float64)
    uu, vv, ww, uv, uw, vw = 4.0, 2.0, 1.0, 0.8, 0.5, 0.3
    out = lund.apply_lund_stacked(
        noise,
        tuple(jnp.asarray(s) for s in (uu, vv, ww, uv, uw, vw)),
        (0.0, 0.0, 0.0))
    u = np.asarray(out).reshape(3, -1)
    R = u @ u.T / u.shape[1]
    target = np.array([[uu, uv, uw], [uv, vv, vw], [uw, vw, ww]])
    np.testing.assert_allclose(R, target, rtol=0.15, atol=0.08)
