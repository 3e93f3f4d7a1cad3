"""Multi-device sharding on the 8-device virtual CPU mesh: exactness of the
sharded generation, halo-exchange path, distributed POD parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pods_digital_filter_tpu.ops import filters, pod
from pods_digital_filter_tpu.parallel import mesh as mesh_lib
from pods_digital_filter_tpu.parallel import pod as dpod
from pods_digital_filter_tpu.parallel import sharding

ARGS = dict(jma=6, kma=8, nfx=2, nfy=2, nfz=2, lnx=1.0, lny=1.0, lnz=1.0)


def test_mesh_creation():
    m = mesh_lib.make_mesh(2, 4)
    assert m.shape == {"t": 2, "s": 4}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(4, 4)


@pytest.mark.parametrize("tshape", [(1, 1), (2, 1), (1, 4), (2, 4)])
def test_sharded_generation_exact(tshape):
    """The exact sharded path equals single-device generation for any mesh
    shape (same noise stream; differences only from float contraction order
    in the differently-sized Toeplitz products)."""
    key = jax.random.key(9)
    single = np.asarray(filters.generate_correlated_noise(
        key, 0, 8, **ARGS, num_components=3, dtype=jnp.float64))
    m = mesh_lib.make_mesh(*tshape)
    shard = np.asarray(sharding.generate_sharded(
        key, m, 0, 8, **ARGS, num_components=3, dtype=jnp.float64))
    np.testing.assert_allclose(shard, single, rtol=1e-12, atol=1e-14)


def test_sharded_halo_statistics():
    """Halo path: correct shapes, finite, unit variance, and identical
    z-covariance structure to the exact path (statistical, not bitwise)."""
    key = jax.random.key(10)
    m = mesh_lib.make_mesh(2, 4)
    args = dict(jma=16, kma=32, nfx=3, nfy=3, nfz=3,
                lnx=1.5, lny=1.5, lnz=1.5)
    y = np.asarray(sharding.generate_sharded_halo(
        key, m, 0, 64, **args, num_components=1, dtype=jnp.float64))[0]
    assert y.shape == (64, 16, 32)
    assert np.isfinite(y).all()
    assert abs(y.var() - 1.0) < 0.15
    # correlation across the tile boundary (k=7|8) must match the filter's
    # autocorrelation — this is exactly what the halo exchange provides
    b = np.asarray(filters.gaussian_fir_coeffs(3, 1.5, jnp.float64))
    want = float(np.sum(b[:-1] * b[1:]))
    got = np.mean(y[:, :, 7] * y[:, :, 8]) / y.var()
    assert abs(got - want) < 0.12, (got, want)


def test_halo_requires_wide_tiles():
    m = mesh_lib.make_mesh(1, 8)
    with pytest.raises(ValueError):
        sharding.generate_sharded_halo(jax.random.key(0), m, 0, 8,
                                       jma=8, kma=16, nfx=4, nfy=4, nfz=4,
                                       lnx=2.0, lny=2.0, lnz=2.0)


def test_divisibility_errors():
    m = mesh_lib.make_mesh(2, 4)
    with pytest.raises(ValueError):
        sharding.generate_sharded(jax.random.key(0), m, 0, 7, **ARGS)
    with pytest.raises(ValueError):
        sharding.generate_sharded(jax.random.key(0), m, 0, 8,
                                  **{**ARGS, "kma": 9})


def test_distributed_pod_matches_single_device():
    key = jax.random.key(11)
    m = mesh_lib.make_mesh(2, 4)
    nsteps = 16
    X = sharding.generate_sharded(
        key, m, 0, nsteps, **ARGS, num_components=3, dtype=jnp.float64)
    res = dpod.distributed_pod(X, m, num_modes_trunc=6)

    # single-device reference via the packed-matrix path
    Xh = np.asarray(X)
    c, ns, jma, kma = Xh.shape
    A = Xh.transpose(0, 2, 3, 1).reshape(c * jma * kma, ns)
    A = A - A.mean(axis=1, keepdims=True)
    ref = pod.snapshot_pod(jnp.asarray(A), num_modes_trunc=6)

    np.testing.assert_allclose(res.energy[:8], ref.energy[:8],
                               rtol=1e-8, atol=1e-12)
    assert res.num_trunc == ref.num_trunc
    phi = res.spatial_modes_packed()
    for j in range(res.num_trunc):
        a, b = phi[:, j], ref.spatial_modes[:, j]
        dot = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        np.testing.assert_allclose(dot, 1.0, atol=1e-8)
    # mean field matches
    np.testing.assert_allclose(res.mean_packed(),
                               Xh.transpose(0, 2, 3, 1).reshape(-1, ns).mean(1),
                               rtol=1e-10, atol=1e-12)


def test_distributed_gram():
    key = jax.random.key(12)
    m = mesh_lib.make_mesh(2, 4)
    A = jax.device_put(
        jax.random.normal(key, (48, 16), dtype=jnp.float64),
        mesh_lib.snapshot_sharding(m))
    C = np.asarray(sharding.distributed_gram(A, 16))
    Ah = np.asarray(A)
    np.testing.assert_allclose(C, Ah.T @ Ah / 16, rtol=1e-10)


def test_sharded_pipeline_matches_serial(tmp_path):
    """--shard_time/--shard_space pipeline == serial pipeline (exact
    counter-indexed path) on an 8-device CPU mesh, end to end through the
    written PODFS model."""
    import numpy as np
    import pytest

    from pods_digital_filter_tpu import replay
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.pipeline import run_pipeline

    def mk(outdir, **kw):
        return PipelineConfig(
            plane=PlaneConfig(jma=10, kma=8, res=0.1),
            filt=FilterConfig(length_scale_x=2.0, length_scale_y=2.0,
                              length_scale_z=2.0, fwidth=2.0),
            podfs=PODFSConfig(num_modes=4, energy_target=1.0),
            nsteps=8, outdir=str(tmp_path / outdir), dtype="float64",
            **kw)

    rs = run_pipeline(mk("serial"))
    rp = run_pipeline(mk("sharded", shard_time=2, shard_space=4))

    np.testing.assert_allclose(rp.mean_field, rs.mean_field, atol=1e-12)
    # the sharded pipeline never gathers A to the host (by design): A is
    # None (explicit absence) and parity is checked via POD + replayed model
    assert rp.A is None
    nv = min(rp.pod.num_valid, rs.pod.num_valid)
    np.testing.assert_allclose(rp.pod.energy[:nv], rs.pod.energy[:nv],
                               rtol=1e-8, atol=1e-13)
    # replayed models agree (sign-invariant end-to-end check)
    m_s = replay.Replayer(replay.load_prf(str(tmp_path / "serial")))
    m_p = replay.Replayer(replay.load_prf(str(tmp_path / "sharded")))
    assert m_s.model.period == pytest.approx(m_p.model.period)
    ts = np.linspace(0.0, m_s.model.period, 5)
    np.testing.assert_allclose(m_p.batch(ts), m_s.batch(ts), atol=1e-7)
