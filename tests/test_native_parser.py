"""Native table parser (native/fastio.c parse_table): exact value round
trips, header skipping, threaded multi-file loading, and agreement with the
Python readers it accelerates."""

import numpy as np
import pytest

from pods_digital_filter_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler available")


def test_parse_roundtrip_g17(tmp_path, rng):
    rows = rng.standard_normal((137, 5)) * 10.0 ** rng.integers(-12, 12, (137, 5))
    path = str(tmp_path / "table.dat")
    assert native.write_rows_g17(path, "w", rows)
    got = native.parse_table(path)
    # %.17g is round-trippable: bitwise equality
    np.testing.assert_array_equal(got, rows)


def test_parse_skips_headers_and_commas(tmp_path):
    path = tmp_path / "mixed.prf"
    path.write_text(
        "# a comment 1.0\t2.0\t3.0\n"
        "type, xyz # type of profile\n"
        "localcs,origin,0,0,0 # origin\n"
        "scale,1,1,1,1,1,1 # scaling factors\n"
        "data,x,y,z,u,v,w\n"
        "1.0,2.0,3.0,4.0,5.0,6.0\n"
        "  7.0\t8.0 9.0,10.0,11.0,12.0\n"
    )
    got = native.parse_table(str(path))
    np.testing.assert_array_equal(
        got, np.arange(1.0, 13.0).reshape(2, 6))


def test_parse_ragged_returns_none(tmp_path):
    path = tmp_path / "ragged.dat"
    path.write_text("1.0 2.0 3.0\n4.0 5.0\n")
    assert native.parse_table(str(path)) is None


def test_parse_missing_file(tmp_path):
    assert native.parse_table(str(tmp_path / "nope.dat")) is None


def test_parse_tables_threaded(tmp_path, rng):
    paths = []
    tables = []
    for i in range(12):
        t = rng.standard_normal((31, 3))
        p = str(tmp_path / f"t{i}.dat")
        native.write_rows_g17(p, "w", t)
        paths.append(p)
        tables.append(t)
    got = native.parse_tables(paths)
    for g, t in zip(got, tables):
        np.testing.assert_array_equal(g, t)


def test_inflow_loader_uses_native(tmp_path, rng):
    from pods_digital_filter_tpu.postproc.probes import (
        read_inflow_data, write_inflow_data)

    A = rng.standard_normal((3 * 40, 7))
    write_inflow_data(A, 40, 3, str(tmp_path))
    got = read_inflow_data(7, 40, 3, str(tmp_path))
    np.testing.assert_allclose(got, A, rtol=1e-12)


def test_field_prf_reader_matches_python(tmp_path, rng):
    from pods_digital_filter_tpu import replay
    from pods_digital_filter_tpu.io import prf as prf_io
    from pods_digital_filter_tpu.io.plane import make_inflow_plane
    from pods_digital_filter_tpu.config import PlaneConfig

    geom = make_inflow_plane(PlaneConfig(jma=6, kma=7, res=0.1))
    mean = rng.standard_normal(3 * geom.num_cells)
    path = prf_io.write_mean_prf(str(tmp_path), mean, geom, (1.0, 0.0, 0.0))

    pts_n, u_n = replay.read_field_prf(path)

    # force the pure-Python branch by monkeypatching parse_table off
    import pods_digital_filter_tpu.native as nat
    orig = nat.parse_table
    nat.parse_table = lambda p: None
    try:
        pts_p, u_p = replay.read_field_prf(path)
    finally:
        nat.parse_table = orig

    np.testing.assert_array_equal(pts_n, pts_p)
    np.testing.assert_array_equal(u_n, u_p)
    np.testing.assert_allclose(u_n, mean.reshape(-1, 3, order="F"), atol=1e-11)
