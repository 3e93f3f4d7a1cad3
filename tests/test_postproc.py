"""Postproc subsystem tests (postproc/ vs reference PODFS.py:515-1240)."""

import numpy as np
import pytest

from pods_digital_filter_tpu.postproc import geometry as geo
from pods_digital_filter_tpu.postproc import planes as pl
from pods_digital_filter_tpu.postproc import probes as pb


# ---------------------------------------------------------------- geometry

def test_polar_coordinates_clamps_axis():
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 3.0, 4.0], [1.0, -1.0, 0.0]])
    r, theta = geo.polar_coordinates(pts, (0.0, 0.0, 0.0))
    assert r[0] == np.finfo(np.float32).eps          # PODFS.py:1104-1105
    np.testing.assert_allclose(r[1], 5.0)
    np.testing.assert_allclose(theta[2], np.pi)      # atan2(0, -1)


def test_cell_areas_unit_quad():
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [2, 0, 0]], dtype=np.float64)
    areas, centers = geo.cell_areas(pts, np.array([[0, 1, 2, 3]]))
    np.testing.assert_allclose(areas, [1.0])
    np.testing.assert_allclose(centers[0], [0.5, 0.5, 0.0])
    tri, _ = geo.cell_areas(pts, np.array([[0, 1, 3]]))
    np.testing.assert_allclose(tri, [0.5])


def test_cell_volumes_unit_shapes():
    # unit tet (V=1/6), unit hex (V=1), wedge = half hex, pyramid
    tet = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    v = geo.cell_volumes(tet, [np.arange(4)], [geo.VTK_TETRA])
    np.testing.assert_allclose(v, [1.0 / 6.0], atol=1e-12)

    hexa = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    v = geo.cell_volumes(hexa, [np.arange(8)], [geo.VTK_HEXAHEDRON])
    np.testing.assert_allclose(v, [1.0], atol=1e-12)

    # VTK wedge: two triangle faces (0,1,2) and (3,4,5)
    wedge = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [0, 1, 1]], float)
    v = geo.cell_volumes(wedge, [np.arange(6)], [geo.VTK_WEDGE])
    np.testing.assert_allclose(v, [0.5], atol=1e-12)

    # VTK pyramid: unit square base + apex above centre, V = 1/3
    pyr = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0.5, 0.5, 1.0]], float)
    v = geo.cell_volumes(pyr, [np.arange(5)], [geo.VTK_PYRAMID])
    np.testing.assert_allclose(v, [1.0 / 3.0], atol=1e-12)


def test_cell_volumes_voxel_rejected():
    pts = np.zeros((8, 3))
    with pytest.raises(ValueError, match="[Vv]oxel"):
        geo.cell_volumes(pts, [np.arange(8)], [geo.VTK_VOXEL])


def test_cell_volumes_mixed_mesh():
    tet = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    hexa = np.array([[2, 0, 0], [3, 0, 0], [3, 1, 0], [2, 1, 0],
                     [2, 0, 1], [3, 0, 1], [3, 1, 1], [2, 1, 1]], float)
    pts = np.concatenate([tet, hexa])
    conn = [np.arange(4), 4 + np.arange(8)]
    v = geo.cell_volumes(pts, conn, [geo.VTK_TETRA, geo.VTK_HEXAHEDRON])
    np.testing.assert_allclose(v, [1.0 / 6.0, 1.0], atol=1e-12)


# ------------------------------------------------------------------ planes

@pytest.fixture
def volume():
    """A small box of scattered points with a linear field (exactly
    reproducible by linear interpolation)."""
    rng = np.random.RandomState(0)
    grid = np.stack(np.meshgrid(*[np.linspace(0, 1, 6)] * 3,
                                indexing="ij"), axis=-1).reshape(-1, 3)
    pts = np.concatenate([grid, rng.rand(200, 3)])
    vel = np.stack([2 * pts[:, 0] + 1,
                    pts[:, 1] - pts[:, 2],
                    3 * pts[:, 2]], axis=1)
    fields = {
        "velocity": vel,
        "k": pts[:, 0] + pts[:, 1],
        "epsilon": np.full(len(pts), 0.3),
    }
    return pts, fields


def test_extract_plane_linear_field(volume):
    pts, fields = volume
    plane = pl.extract_plane(pts, fields, normal=(1, 0, 0),
                             origin=(0.5, 0.5, 0.5), resolution=8,
                             extent=0.45)
    # all plane points have x = 0.5; linear velocity reproduced exactly
    np.testing.assert_allclose(plane.points[:, 0], 0.5, atol=1e-12)
    np.testing.assert_allclose(plane.fields["velocity"][:, 0], 2.0, atol=1e-9)
    np.testing.assert_allclose(
        plane.fields["velocity"][:, 2], 3 * plane.points[:, 2], atol=1e-9)
    assert plane.connectivity.shape == (64, 4)


def test_save_planes_prf_and_pod_matrix(tmp_path, volume):
    pts, fields = volume
    specs = [
        pl.PlaneSpec("inlet", (1, 0, 0), (0.5, 0.5, 0.5), save=True, pod=True,
                     r_limits=(0.0, 10.0)),
    ]
    res = 6
    n_cells = res * res
    pod_matrix = {"inlet": np.zeros((3 * n_cells, 2))}
    paths = pl.save_planes(pts, fields, specs, time=0.1, snap_index=0,
                           outdir=str(tmp_path), pod_matrix=pod_matrix,
                           resolution=res)
    assert len(paths) == 1 and paths[0].endswith(".prf")
    with open(paths[0]) as f:
        head = f.read()
    assert "# inlet # name of the profile" in head
    assert "data,x,y,z,u,v,w,k,e" in head              # PODFS.py:676-677
    # POD column filled, non-zero
    assert np.abs(pod_matrix["inlet"][:, 0]).max() > 0
    assert np.abs(pod_matrix["inlet"][:, 1]).max() == 0


def test_save_planes_radius_mask(volume):
    pts, fields = volume
    specs = [pl.PlaneSpec("m", (1, 0, 0), (0.5, 0.5, 0.5), save=False,
                          pod=True, r_limits=(0.0, 1e-9))]
    n_cells = 4 * 4
    pod_matrix = {"m": np.zeros((3 * n_cells, 1))}
    pl.save_planes(pts, fields, specs, 0.0, 0, ".", pod_matrix, resolution=4)
    # a vanishing radial window masks every cell to zero (PODFS.py:700-716)
    np.testing.assert_allclose(pod_matrix["m"], 0.0)


# ------------------------------------------------------------------ probes

def test_vi_dat_roundtrip(tmp_path):
    t = np.linspace(0, 1, 7)
    p = np.random.RandomState(1).randn(3, 7)
    path = pb.write_vi_dat(str(tmp_path / "probes"), t, p, fs=2.0,
                           fmax=[10.0, 20.0, 30.0])
    t2, p2 = pb.read_vi_dat(path)
    np.testing.assert_allclose(t2, t, atol=1e-9)
    np.testing.assert_allclose(p2, p, atol=1e-12)
    with open(path) as f:
        txt = f.read()
    assert "# No. of Sensors = 3" in txt
    assert "Variables = t,K1,K2,K3" in txt


def test_inflow_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    num_cells, ns = 10, 4
    A = rng.randn(3 * num_cells, ns)
    pb.write_inflow_data(A, num_cells, 3, str(tmp_path))
    A2 = pb.read_inflow_data(ns, num_cells, 3, str(tmp_path))
    np.testing.assert_allclose(A2, A, atol=1e-10)
