"""PODFS compression of existing snapshot data (compress.py)."""

import numpy as np

from pods_digital_filter_tpu import compress
from pods_digital_filter_tpu.io.prf import read_podfs_dat
from pods_digital_filter_tpu.postproc.probes import write_inflow_data


def _periodic_snapshots(npts=12, ns=16):
    """Two spatial patterns oscillating at distinct frequencies — POD must
    recover a 2-mode structure."""
    rng = np.random.RandomState(0)
    phi1 = rng.randn(3 * npts)
    phi2 = rng.randn(3 * npts)
    t = np.arange(ns)
    a1 = np.cos(2 * np.pi * 2 * t / ns)
    a2 = np.sin(2 * np.pi * 3 * t / ns)
    return 1.0 + np.outer(phi1, a1) + np.outer(phi2, a2)


def test_compress_end_to_end(tmp_path):
    npts, ns = 12, 16
    A = _periodic_snapshots(npts, ns)
    points = np.random.RandomState(1).rand(npts, 3)
    pr, fr, files = compress.compress_snapshot_matrix(
        A, points, dt=0.01, num_modes=4, energy_target=0.99,
        outdir=str(tmp_path / "out"))
    # rank-2 data -> 2 dominant eigenvalues
    assert pr.energy[1] > 1e3 * max(pr.energy[2], 1e-30)
    period, modes = read_podfs_dat(str(tmp_path / "out" / "PODFS.dat"))
    assert period == 16 * 0.01
    # the data has only frequencies +/-2 and +/-3; POD modes may mix both
    # spatial patterns, so each temporal mode keeps 2 or 4 coefficients,
    # all at |k| in {2, 3}
    for m in modes[:2]:
        assert m.shape[0] in (2, 4)
        assert {abs(int(k)) for k in m[:, 0]} <= {2, 3}


def test_compress_cli_roundtrip(tmp_path):
    npts, ns = 8, 10
    A = _periodic_snapshots(npts, ns)
    write_inflow_data(A, npts, 3, str(tmp_path))
    pts = np.random.RandomState(2).rand(npts, 3)
    np.savetxt(str(tmp_path / "points.txt"), pts)
    rc = compress.main([
        "--input-dir", str(tmp_path), "--num-snapshots", str(ns),
        "--num-cells", str(npts), "--dt", "0.5",
        "--points", str(tmp_path / "points.txt"),
        "-m", "3", "--outdir", str(tmp_path / "out"), "-5",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "PODFS.dat").exists()
    assert (tmp_path / "out" / "PODFS.hdf5").exists()
    with open(tmp_path / "out" / "PODFS_mean.prf") as f:
        lines = f.read().splitlines()
    assert len(lines) == 11 + npts
    # mean of the constructed data is 1.0 everywhere
    vals = [float(v) for v in lines[11].split(",")[3:]]
    np.testing.assert_allclose(vals, 1.0, atol=1e-5)


def test_compress_cli_multivar(tmp_path):
    """--vars through the CLI: a velocity + 2-scalar model exports with the
    right columns and replays through both evaluators."""
    npts, ns = 8, 10
    rng = np.random.RandomState(3)
    A = 1.0 + 0.1 * rng.randn(5 * npts, ns)
    write_inflow_data(A, npts, 5, str(tmp_path))
    pts = rng.rand(npts, 3)
    np.savetxt(str(tmp_path / "points.txt"), pts)
    rc = compress.main([
        "--input-dir", str(tmp_path), "--num-snapshots", str(ns),
        "--num-cells", str(npts), "--dt", "0.5",
        "--points", str(tmp_path / "points.txt"),
        "--vars", "velocity:3,k,epsilon",
        "-m", "3", "--outdir", str(tmp_path / "out"), "-5",
    ])
    assert rc == 0

    from pods_digital_filter_tpu import replay

    m = replay.load_prf(str(tmp_path / "out"))
    assert m.num_slots == 5
    assert m.columns == ("u", "v", "w", "k", "epsilon")
    h = replay.load_hdf5(str(tmp_path / "out" / "PODFS.hdf5"))
    np.testing.assert_allclose(h.mean, m.mean, atol=1e-11)
    u = replay.Replayer(m)(0.25)
    assert u.shape == (npts, 5)

    # mismatched --num-components is rejected loudly
    import pytest
    with pytest.raises(ValueError, match="num-components"):
        compress.main([
            "--input-dir", str(tmp_path), "--num-snapshots", str(ns),
            "--num-cells", str(npts), "--dt", "0.5",
            "--num-components", "3", "--vars", "velocity:3,k",
            "--outdir", str(tmp_path / "out2"),
        ])
