"""PODFS replay module: load both on-disk model flavors and evaluate the
replay equation (docs/usage/CFDCodeIntegration.rst:85-91) on-device.

The round-trip oracle: with et=1 (all Fourier coefficients kept), replaying
at the snapshot times must reproduce mean + truncated POD reconstruction —
and, when all valid modes are kept, the original snapshots themselves.
"""

import os

import numpy as np
import pytest

from pods_digital_filter_tpu import replay
from pods_digital_filter_tpu.config import (
    FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig,
)
from pods_digital_filter_tpu.pipeline import run_pipeline


@pytest.fixture(scope="module")
def model_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("replay") / "PODFS"
    cfg = PipelineConfig(
        plane=PlaneConfig(jma=10, kma=11, res=0.1),
        filt=FilterConfig(length_scale_x=2.0, length_scale_y=2.0,
                          length_scale_z=2.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=6, energy_target=1.0),
        nsteps=12, outdir=str(out), dtype="float64", hdf5=True,
    )
    res = run_pipeline(cfg)
    return cfg, res


def test_load_prf_and_hdf5_agree(model_run):
    cfg, res = model_run
    m_prf = replay.load_prf(cfg.outdir)
    m_h5 = replay.load_hdf5(os.path.join(cfg.outdir, "PODFS.hdf5"))

    assert m_prf.num_modes == m_h5.num_modes == res.pod.num_trunc
    assert m_prf.period == pytest.approx(m_h5.period)
    np.testing.assert_allclose(m_prf.points, m_h5.points, atol=1e-11)
    # .prf cells are %0.12f fixed-width; HDF5 is full float64
    np.testing.assert_allclose(m_prf.mean, m_h5.mean, atol=1e-11)
    np.testing.assert_allclose(m_prf.modes, m_h5.modes, atol=1e-11)
    np.testing.assert_allclose(m_prf.k, m_h5.k)
    # PODFS.dat floats are shortest-repr -> exact round trip
    np.testing.assert_allclose(m_prf.c_re, m_h5.c_re, rtol=1e-12)
    np.testing.assert_allclose(m_prf.c_im, m_h5.c_im, rtol=1e-12)
    np.testing.assert_array_equal(m_prf.counts, m_h5.counts)


def test_load_model_dispatch(model_run):
    cfg, _ = model_run
    assert isinstance(replay.load_model(cfg.outdir), replay.PODFSModel)
    assert isinstance(
        replay.load_model(os.path.join(cfg.outdir, "PODFS.hdf5")),
        replay.PODFSModel)


def test_replay_matches_pod_reconstruction(model_run):
    cfg, res = model_run
    rp = replay.Replayer(replay.load_hdf5(os.path.join(cfg.outdir, "PODFS.hdf5")))
    ns = cfg.nsteps
    nm = rp.model.num_modes
    ts = np.arange(ns) * res.dt

    got = rp.batch(ts)                       # (Ns, Np, 3)
    npts = rp.model.num_points
    got_packed = got.transpose(0, 2, 1).reshape(ns, 3 * npts).T  # (3Np, Ns)

    want = (res.mean_field[:, None]
            + res.pod.spatial_modes @ res.pod.temporal_modes[:, :nm].T)
    np.testing.assert_allclose(got_packed, want, atol=1e-7)

    # all valid modes kept -> the original snapshots themselves
    if nm == res.pod.num_valid:
        A_orig = res.mean_field[:, None] + res.A
        np.testing.assert_allclose(got_packed, A_orig, atol=1e-6)


def test_replay_single_time_and_alpha(model_run):
    cfg, res = model_run
    rp = replay.Replayer(replay.load_prf(cfg.outdir))

    u0 = rp(0.0)
    assert u0.shape == (rp.model.num_points, 3)
    np.testing.assert_allclose(u0, rp.batch([0.0])[0])

    # alpha scales only the mean contribution
    u_a = rp(0.0, alpha=2.0)
    mean = rp.model.mean.reshape(3, -1).T
    np.testing.assert_allclose(u_a - u0, mean, atol=1e-9)


def test_replay_periodicity(model_run):
    """The Fourier series is T-periodic: t and t+T give identical fields."""
    cfg, _ = model_run
    rp = replay.Replayer(replay.load_prf(cfg.outdir))
    t = 0.37 * rp.model.period
    np.testing.assert_allclose(rp(t), rp(t + rp.model.period), atol=1e-8)


def test_replay_cli(model_run, tmp_path, monkeypatch):
    from pods_digital_filter_tpu import replay as replay_mod

    cfg, _ = model_run
    out_prf = str(tmp_path / "rp")
    rc = replay_mod.main([cfg.outdir, "-n", "3", "--outdir", out_prf])
    assert rc == 0
    import os
    prfs = [p for p in os.listdir(out_prf) if p.endswith(".prf")]
    assert len(prfs) == 3

    out_npy = str(tmp_path / "rpn")
    rc = replay_mod.main([os.path.join(cfg.outdir, "PODFS.hdf5"),
                          "-n", "4", "--format", "npy", "--outdir", out_npy])
    assert rc == 0
    f = np.load(os.path.join(out_npy, "fields.npy"))
    t = np.load(os.path.join(out_npy, "times.npy"))
    assert f.shape[0] == t.shape[0] == 4
    assert f.shape[2] == 3

    # CLI .prf output replays to the same values as the API
    rp = replay_mod.Replayer(replay_mod.load_prf(cfg.outdir))
    pts, u0 = replay_mod.read_field_prf(
        os.path.join(out_prf, sorted(prfs)[0]))
    np.testing.assert_allclose(u0, rp(0.0), atol=1e-11)


def test_native_c_replayer_matches_jax(model_run):
    """The linkable C solver library (native/podfs_replay.c) must agree with
    the JAX Replayer to float64 round-off on the same model directory."""
    from pods_digital_filter_tpu import native

    if not native.podfs_replay_available():
        pytest.skip("no C compiler available")
    cfg, _ = model_run
    rp = replay.Replayer(replay.load_prf(cfg.outdir))
    with native.NativePODFSReplayer(cfg.outdir) as nrp:
        assert nrp.num_points == rp.model.num_points
        assert nrp.num_modes == rp.model.num_modes
        assert nrp.period == pytest.approx(rp.model.period)
        np.testing.assert_allclose(nrp.points, rp.model.points, atol=1e-11)

        ts = np.array([0.0, 0.123, 0.5 * nrp.period, 0.999 * nrp.period])
        u_c = nrp.eval_batch(ts)
        u_j = rp.batch(ts)
        np.testing.assert_allclose(u_c, u_j, atol=1e-9)

        # single-time path + alpha semantics
        np.testing.assert_allclose(nrp.eval(0.123, alpha=2.0),
                                   rp(0.123, alpha=2.0), atol=1e-9)


def test_native_c_replayer_bad_model(tmp_path):
    from pods_digital_filter_tpu import native

    if not native.podfs_replay_available():
        pytest.skip("no C compiler available")
    with pytest.raises(RuntimeError):
        native.NativePODFSReplayer(str(tmp_path / "nonexistent"))


def test_native_c_replayer_ragged_counts(tmp_path):
    """With et<1 the per-mode coefficient counts differ (ragged PODFS.dat);
    the C loader's offset bookkeeping must still match the JAX evaluator."""
    from pods_digital_filter_tpu import native

    if not native.podfs_replay_available():
        pytest.skip("no C compiler available")
    out = tmp_path / "PODFS"
    cfg = PipelineConfig(
        plane=PlaneConfig(jma=8, kma=9, res=0.1),
        filt=FilterConfig(length_scale_x=1.5, length_scale_y=1.5,
                          length_scale_z=1.5, fwidth=2.0),
        podfs=PODFSConfig(num_modes=5, energy_target=0.85),
        nsteps=16, outdir=str(out), dtype="float64",
    )
    run_pipeline(cfg)
    rp = replay.Replayer(replay.load_prf(str(out)))
    counts = rp.model.counts
    assert len(set(counts.tolist())) > 1, "fixture should be ragged"
    with native.NativePODFSReplayer(str(out)) as nrp:
        ts = np.linspace(0.0, 1.7 * nrp.period, 7)
        np.testing.assert_allclose(nrp.eval_batch(ts), rp.batch(ts),
                                   atol=1e-9)


def test_native_c_replayer_rejects_corrupt_model(model_run, tmp_path):
    """Truncated rows / trailing garbage must fail podfs_load loudly (NULL)
    instead of silently defining a smaller model (advisor finding r1)."""
    import shutil

    from pods_digital_filter_tpu import native

    if not native.podfs_replay_available():
        pytest.skip("no C compiler available")
    cfg, _ = model_run

    # (a) mean profile with a truncated final row
    bad = tmp_path / "trunc_mean"
    shutil.copytree(cfg.outdir, bad)
    mean_path = bad / "PODFS_mean.prf"
    lines = mean_path.read_text().splitlines(keepends=True)
    lines[-1] = ",".join(lines[-1].split(",")[:4]) + "\n"  # 4 of 6 columns
    mean_path.write_text("".join(lines))
    with pytest.raises(RuntimeError):
        native.NativePODFSReplayer(str(bad))

    # (b) control file with trailing garbage
    bad2 = tmp_path / "garbage_dat"
    shutil.copytree(cfg.outdir, bad2)
    with open(bad2 / "PODFS.dat", "a") as f:
        f.write("unexpected trailing text\n")
    with pytest.raises(RuntimeError):
        native.NativePODFSReplayer(str(bad2))

    # (c) mode file with a non-numeric token mid-file
    bad3 = tmp_path / "corrupt_mode"
    shutil.copytree(cfg.outdir, bad3)
    mode_path = bad3 / "PODFS_mode_0001.prf"
    txt = mode_path.read_text().splitlines(keepends=True)
    k = len(txt) // 2
    txt[k] = "x" + txt[k]
    mode_path.write_text("".join(txt))
    with pytest.raises(RuntimeError):
        native.NativePODFSReplayer(str(bad3))
