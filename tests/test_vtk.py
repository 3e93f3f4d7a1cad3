"""Legacy-VTK writer tests (io/vtk.py vs reference PODFS.py:129-498)."""

import numpy as np
import pytest

from pods_digital_filter_tpu.config import PlaneConfig
from pods_digital_filter_tpu.io import vtk as vtk_io
from pods_digital_filter_tpu.io.plane import make_inflow_plane


@pytest.fixture
def geom():
    return make_inflow_plane(PlaneConfig(jma=4, kma=5, res=0.1))


def test_quad_connectivity_indices(geom):
    jma, kma = 4, 5
    conn = vtk_io.quad_connectivity(jma, kma)
    assert conn.shape == (jma * kma, 4)
    # every node index valid, each interior node used by 4 cells
    assert conn.min() == 0 and conn.max() == (jma + 1) * (kma + 1) - 1
    # cell p = j*kma + i wraps the cell centre
    centers = geom.cell_centers
    nodes = geom.node_points
    quad_mean = nodes[conn].mean(axis=1)
    np.testing.assert_allclose(quad_mean, centers, atol=1e-12)


def test_mean_field_vtk_roundtrip(tmp_path, geom):
    n_cells = geom.num_cells
    packed = np.arange(3 * n_cells, dtype=np.float64)
    path = vtk_io.write_mean_field_vtk(str(tmp_path), packed, geom)
    out = vtk_io.read_unstructured_grid(path)
    assert out["points"].shape == ((4 + 1) * (5 + 1), 3)
    np.testing.assert_allclose(out["points"], geom.node_points, atol=1e-12)
    # component scalars named <var>_k_POD, vector <var>_POD (PODFS.py:252-270)
    np.testing.assert_allclose(
        out["cell_data"]["velocity_1_POD"], packed[:n_cells])
    np.testing.assert_allclose(
        out["cell_data"]["velocity_3_POD"], packed[2 * n_cells:])
    vec = out["cell_data"]["velocity_POD"]
    np.testing.assert_allclose(vec[:, 1], packed[n_cells:2 * n_cells])


def test_spatial_modes_vtk_point_data(tmp_path, geom):
    n_cells = geom.num_cells
    rng = np.random.RandomState(0)
    modes = rng.randn(3 * n_cells, 2)
    paths = vtk_io.write_spatial_modes_vtk(str(tmp_path), modes, geom, 2)
    assert [p.endswith(f"POD.spatial_mode_velocity_{i:04d}.vtk")
            for i, p in zip((1, 2), paths)] == [True, True]
    out = vtk_io.read_unstructured_grid(paths[0])
    # point data after cell->point averaging: constant field stays constant
    const = np.ones(3 * n_cells)
    p2 = vtk_io.write_spatial_modes_vtk(str(tmp_path), const[:, None], geom, 1)
    out2 = vtk_io.read_unstructured_grid(p2[0])
    np.testing.assert_allclose(out2["point_data"]["velocity_1_POD"], 1.0)
    np.testing.assert_allclose(
        out2["point_data"]["velocity_magnitude_POD"], np.sqrt(3.0))
    # magnitude consistent with components at every point
    mag = out["point_data"]["velocity_magnitude_POD"]
    assert mag.shape == ((4 + 1) * (5 + 1),)


def test_header_is_valid_legacy_vtk(tmp_path, geom):
    packed = np.zeros(3 * geom.num_cells)
    path = vtk_io.write_mean_field_vtk(str(tmp_path), packed, geom)
    with open(path, "rb") as f:
        head = f.read(200)
    assert head.startswith(b"# vtk DataFile Version 3.0\n")
    assert b"BINARY\n" in head
    assert b"DATASET UNSTRUCTURED_GRID\n" in head
    assert b"POINTS 30 double\n" in head
