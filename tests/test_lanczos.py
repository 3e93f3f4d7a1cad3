"""Device-resident Lanczos (ops/lanczos.py): the round-5 vector stage of
the two-phase streaming eigendecomposition.  Parity against the host LAPACK
path on realistic Gram spectra, robustness at breakdown (low rank), and the
residual quality gate."""

import jax.numpy as jnp
import numpy as np

from pods_digital_filter_tpu.ops import lanczos, pod


def _gram(rng, n, r, decay):
    B = rng.standard_normal((n, r)) * np.exp(-decay * np.arange(r))
    return (B @ B.T) / r + 1e-10 * np.eye(n)


def test_lanczos_matches_lapack_decaying(rng):
    n, k = 600, 8
    C = _gram(rng, n, 64, 0.15)
    e_ref, v_ref = pod.eigh_desc_topk(C, k)
    e, V, res = lanczos.lanczos_topk(jnp.asarray(C), k)
    assert res < 1e-8
    np.testing.assert_allclose(e, e_ref, rtol=1e-9)
    overlap = np.abs(np.einsum("ij,ij->j", v_ref, V))
    np.testing.assert_allclose(overlap, 1.0, atol=1e-7)


def test_lanczos_flat_spectrum(rng):
    """Near-flat upper edge (the flagship's regime: broadband turbulence,
    top eigenvalue only ~10x the bulk) — the hard case for Krylov methods;
    the generous default m must still converge."""
    n, k = 500, 10
    # slowly decaying dense spectrum
    lam = 1.0 / (1.0 + 0.05 * np.arange(n))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    C = (Q * lam) @ Q.T
    C = (C + C.T) / 2
    e_ref, v_ref = pod.eigh_desc_topk(C, k)
    e, V = lanczos.topk_or_none(jnp.asarray(C), k)
    assert e is not None
    np.testing.assert_allclose(e, e_ref, rtol=1e-8)
    overlap = np.abs(np.einsum("ij,ij->j", v_ref, V))
    np.testing.assert_allclose(overlap, 1.0, atol=1e-5)


def test_lanczos_breakdown_low_rank(rng):
    """Rank-deficient Gram (rank < Krylov dim): the recurrence hits exact
    breakdown and must restart cleanly; top eigenpairs stay exact."""
    n, r, k = 300, 6, 4
    C = _gram(rng, n, r, 0.0) - 1e-10 * np.eye(n)   # exact rank r
    e_ref, _ = pod.eigh_desc_topk(C, k)
    e, V, res = lanczos.lanczos_topk(jnp.asarray(C), k, m=64)
    assert res < 1e-7
    np.testing.assert_allclose(e, e_ref, rtol=1e-8, atol=1e-12)


def test_lanczos_m_clamped_exact_small():
    """m >= n degenerates to a full tridiagonalization — exact spectrum."""
    rng = np.random.default_rng(5)
    C = _gram(rng, 24, 24, 0.1)
    e_ref, _ = pod.eigh_desc(C)
    e, V, res = lanczos.lanczos_topk(jnp.asarray(C), 24, m=999)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-13)
    # Ritz basis orthonormal
    np.testing.assert_allclose(V.T @ V, np.eye(24), atol=1e-8)


def test_quality_gate_rejects_undersized_krylov(rng):
    """topk_or_none falls back (returns None) when the Krylov space is too
    small for the requested accuracy — the caller then uses the host path."""
    n, k = 500, 10
    lam = 1.0 / (1.0 + 0.02 * np.arange(n))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    C = (Q * lam) @ Q.T
    e, V = lanczos.topk_or_none(jnp.asarray((C + C.T) / 2), k, m=12)
    assert e is None and V is None


def test_symmetrize_gram_device_matches_host(tmp_path):
    """streamed_gram(return_device=True): the symmetrized device
    accumulator equals the host-assembled Gram matrix."""
    from pods_digital_filter_tpu import streaming
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.pipeline import resolve_profile

    cfg = PipelineConfig(
        plane=PlaneConfig(jma=9, kma=10, res=0.1),
        filt=FilterConfig(length_scale_x=2.0, length_scale_y=2.0,
                          length_scale_z=2.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=5, energy_target=0.9),
        nsteps=14, outdir=str(tmp_path), dtype="float64")
    fields, dt, filt, cfg2, rotate = resolve_profile(cfg)
    gen_c = streaming.make_centered_generator(
        cfg2, fields, filt, 5, 14, rotate,
        jnp.zeros(3 * 9 * 10, dtype=jnp.float64))
    C_host, C_dev = streaming.streamed_gram(gen_c, 14, 5,
                                            streaming._pair_products,
                                            group=2, return_device=True)
    assert C_dev is not None
    C_sym = np.asarray(streaming.symmetrize_gram_device(C_dev, 14))
    np.testing.assert_allclose(C_sym, C_host, rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(C_sym, C_sym.T, atol=0)


def test_full_spectrum_matches_eigvalsh(rng):
    """m = n Lanczos with full reorthogonalization is a complete
    tridiagonalization: the device full-spectrum path must match host
    eigvalsh across the WHOLE spectrum (f64)."""
    n = 220
    C = _gram(rng, n, 64, 0.1)
    e_ref = pod.eig_spectrum_desc(C)
    e = lanczos.full_spectrum(jnp.asarray(C))
    assert e.shape == (n,)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-12)


def test_full_spectrum_f32_noise_floor(rng):
    """In float32 the device spectrum matches a float64 solve of the same
    matrix to the f32 noise floor (~eps * lambda_0) — the same floor the
    f32-accumulated Gram data itself carries."""
    n = 300
    C64 = _gram(rng, n, 48, 0.05)
    e_ref = pod.eig_spectrum_desc(C64)
    e = lanczos.full_spectrum(jnp.asarray(C64, dtype=jnp.float32))
    np.testing.assert_allclose(e, e_ref, atol=5e-5 * e_ref[0])
    # top of the spectrum is much tighter
    np.testing.assert_allclose(e[:10], e_ref[:10], rtol=2e-5)


def test_full_spectrum_rank_deficient(rng):
    """Breakdown restarts mid-run must still produce the complete exact
    spectrum (rank-deficient Gram, trailing zeros)."""
    n, r = 150, 12
    C = _gram(rng, n, r, 0.0) - 1e-10 * np.eye(n)
    e_ref = pod.eig_spectrum_desc(C)
    e = lanczos.full_spectrum(jnp.asarray(C))
    np.testing.assert_allclose(e[:r], e_ref[:r], rtol=1e-8)
    np.testing.assert_allclose(e[r:], 0.0, atol=1e-7 * e_ref[0])


def test_streamed_gram_keep_host_false(tmp_path):
    """keep_host=False skips the host assembly (C is None) but the device
    accumulator still symmetrizes to the exact host Gram values."""
    from pods_digital_filter_tpu import streaming
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.pipeline import resolve_profile

    cfg = PipelineConfig(
        plane=PlaneConfig(jma=9, kma=10, res=0.1),
        filt=FilterConfig(length_scale_x=2.0, length_scale_y=2.0,
                          length_scale_z=2.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=5, energy_target=0.9),
        nsteps=14, outdir=str(tmp_path), dtype="float64")
    fields, dt, filt, cfg2, rotate = resolve_profile(cfg)
    gen_c = streaming.make_centered_generator(
        cfg2, fields, filt, 5, 14, rotate,
        jnp.zeros(3 * 9 * 10, dtype=jnp.float64))
    C_ref, _ = streaming.streamed_gram(gen_c, 14, 5,
                                       streaming._pair_products,
                                       group=2, return_device=True)
    C_none, C_dev = streaming.streamed_gram(gen_c, 14, 5,
                                            streaming._pair_products,
                                            group=2, return_device=True,
                                            keep_host=False)
    assert C_none is None and C_dev is not None
    C_sym = np.asarray(streaming.symmetrize_gram_device(C_dev, 14))
    np.testing.assert_allclose(C_sym, C_ref, rtol=1e-13, atol=1e-15)
