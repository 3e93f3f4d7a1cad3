"""Multi-variable / scalar POD (VERDICT r1 #4) — the reference's
``num_vars`` path: POD of stacked vector + scalar variables
(PODFS.py:1294, packing at PODFS.py:706-734), the multi-var mode-writer
layouts (PODFS.py:202-435), HDF5 ``Nvar``/``Vars`` attrs (HDF5.py:31-42),
and both replay evaluators (JAX + linkable C) on multi-var models."""

import os

import numpy as np
import pytest

from pods_digital_filter_tpu import replay
from pods_digital_filter_tpu.compress import compress_snapshot_matrix
from pods_digital_filter_tpu.variables import Variable, VariableSet


# --------------------------------------------------------------------------
# VariableSet semantics
# --------------------------------------------------------------------------

def test_variableset_layout():
    vs = VariableSet((Variable("velocity", 3), Variable("k"),
                      Variable("epsilon")))
    assert vs.num_slots == 5
    assert vs.var_name == "velocity,k,epsilon"
    assert vs.column_names == ("u", "v", "w", "k", "epsilon")
    assert [(v.name, cc) for v, cc in vs.slot_ranges()] == [
        ("velocity", 0), ("k", 3), ("epsilon", 4)]


def test_variableset_name_detection():
    # the reference's name-based vector detection (PODFS.py:217/305)
    vs = VariableSet.from_names(["U", "tke", "SprayVelocity"])
    assert [v.ncomp for v in vs.variables] == [3, 1, 3]
    # explicit flags override
    vs2 = VariableSet.from_names(["a", "b"], vector_flags=[True, False])
    assert [v.ncomp for v in vs2.variables] == [3, 1]


def test_variableset_parse():
    vs = VariableSet.parse("velocity:3,k,epsilon")
    assert vs.num_slots == 5
    assert VariableSet.parse("U,p").num_slots == 4     # U auto-vector
    with pytest.raises(ValueError):
        VariableSet.parse("a:2")                       # ncomp must be 1 or 3
    with pytest.raises(ValueError):
        VariableSet.parse("a,a")                       # duplicate names


def test_variableset_pack_unpack_table(rng):
    npts, ns = 17, 4
    vs = VariableSet.parse("velocity:3,k")
    u = rng.normal(size=(npts, 3, ns))
    k = rng.normal(size=(npts, ns))
    A = vs.pack([u, k])
    assert A.shape == (4 * npts, ns)
    # slot order: u, v, w, k (reference packing PODFS.py:706-734)
    np.testing.assert_array_equal(A[:npts], u[:, 0])
    np.testing.assert_array_equal(A[2 * npts:3 * npts], u[:, 2])
    np.testing.assert_array_equal(A[3 * npts:], k)

    out = vs.unpack(A[:, 0], npts)
    np.testing.assert_array_equal(out["velocity"], u[:, :, 0])
    np.testing.assert_array_equal(out["k"], k[:, 0])

    tab = vs.table(A[:, 0], npts)
    assert tab.shape == (npts, 4)
    np.testing.assert_array_equal(tab[:, 3], k[:, 0])


# --------------------------------------------------------------------------
# compress -> export -> replay round trip (velocity + 2 scalars)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def multivar_model(tmp_path_factory):
    rng = np.random.default_rng(7)
    npts, ns, dt = 30, 10, 0.05
    vs = VariableSet.parse("velocity:3,k,epsilon")
    points = rng.normal(size=(npts, 3))
    u = rng.normal(size=(npts, 3, ns)) + 1.0
    k = np.abs(rng.normal(size=(npts, ns))) + 0.5
    eps = np.abs(rng.normal(size=(npts, ns))) + 0.1
    A = vs.pack([u, k, eps])

    outdir = str(tmp_path_factory.mktemp("multivar") / "PODFS")
    pr, fr, files = compress_snapshot_matrix(
        A, points, dt, num_modes=ns, energy_target=1.0, outdir=outdir,
        write_hdf5=True, varset=vs, dtype="float64")
    return dict(A=A, points=points, dt=dt, ns=ns, npts=npts, vs=vs,
                pr=pr, fr=fr, outdir=outdir)


def test_multivar_export_files(multivar_model):
    m = multivar_model
    assert os.path.exists(os.path.join(m["outdir"], "PODFS.dat"))
    # the .prf data header carries all five columns
    cols = replay.read_prf_columns(os.path.join(m["outdir"],
                                                "PODFS_mean.prf"))
    assert cols == ("u", "v", "w", "k", "epsilon")


def test_multivar_hdf5_attrs(multivar_model):
    import h5py

    m = multivar_model
    with h5py.File(os.path.join(m["outdir"], "PODFS.hdf5")) as f:
        mean = f["main/mean"]
        assert int(mean.attrs["Nvar"]) == 8          # x,y,z + 5 slots
        assert mean.attrs["Vars"] == b"x,y,z,u,v,w,k,epsilon,dummy"
        assert list(mean.attrs["SF"]) == [1.0] * 8
        assert int(mean.attrs["Np"]) == m["npts"]


def test_multivar_replay_roundtrip(multivar_model):
    """et=1.0 model: replay at the snapshot times reproduces the truncated
    POD reconstruction of the multi-variable snapshots (all 5 slots) — and
    the original snapshots when all valid modes are kept."""
    m = multivar_model
    pr = m["pr"]
    mean = m["A"].mean(axis=1)
    want = (mean[:, None]
            + pr.spatial_modes @ pr.temporal_modes[:, :pr.num_trunc].T)
    for model in (replay.load_prf(m["outdir"]),
                  replay.load_hdf5(os.path.join(m["outdir"], "PODFS.hdf5"))):
        assert model.num_slots == 5
        assert model.columns == ("u", "v", "w", "k", "epsilon")
        rp = replay.Replayer(model)
        ts = np.arange(m["ns"]) * m["dt"]
        got = rp.batch(ts)                   # (Ns, Np, 5)
        assert got.shape == (m["ns"], m["npts"], 5)
        got_packed = got.transpose(0, 2, 1).reshape(
            m["ns"], 5 * m["npts"]).T
        np.testing.assert_allclose(got_packed, want, atol=1e-6)
        # note: num_valid (the reference's quirky double-increment count,
        # PODFS.py:1313-1318) stops below the true rank Ns-1, so exact
        # snapshot recovery is not expected — reconstruction parity is the
        # oracle, as in test_replay.py


def test_multivar_native_c_replayer(multivar_model):
    """The linkable C evaluator handles multi-var models identically to the
    JAX Replayer (nvars from the .prf data header)."""
    from pods_digital_filter_tpu import native

    if not native.podfs_replay_available():
        pytest.skip("no C compiler")
    m = multivar_model
    rp = replay.Replayer(replay.load_prf(m["outdir"]))
    ts = np.linspace(0.0, rp.model.period, 6)
    with native.NativePODFSReplayer(m["outdir"]) as c:
        assert c.num_vars == 5
        assert c.num_points == m["npts"]
        got = c.eval_batch(ts)
        assert got.shape == (6, m["npts"], 5)
    np.testing.assert_allclose(got, rp.batch(ts), atol=1e-9)


def test_multivar_vtk_mode_writer(multivar_model, tmp_path):
    """Multi-var VTK array layout (PODFS.py:299-345): per-component +
    magnitude + vector arrays for the vector variable, one scalar array per
    scalar variable; the filename carries the comma-joined var_name."""
    from types import SimpleNamespace

    from pods_digital_filter_tpu.io import vtk as vtk_io

    m = multivar_model
    # synthesize a structured-plane geometry whose cell count matches
    jma, kma = 5, 6
    n_cells = jma * kma
    vs = m["vs"]
    packed = np.arange(vs.num_slots * n_cells, dtype=np.float64)
    nodes = np.stack(np.meshgrid(np.arange(jma + 1), np.arange(kma + 1),
                                 indexing="ij"), axis=-1).reshape(-1, 2)
    node_points = np.concatenate(
        [np.zeros((nodes.shape[0], 1)), nodes], axis=1)
    geom = SimpleNamespace(
        config=SimpleNamespace(jma=jma, kma=kma), node_points=node_points)

    paths = vtk_io.write_spatial_modes_vtk(
        str(tmp_path), packed[:, None], geom, varset=vs)
    assert paths == [os.path.join(
        str(tmp_path), "POD.spatial_mode_velocity,k,epsilon_0001.vtk")]
    d = vtk_io.read_unstructured_grid(paths[0])
    names = set(d["point_data"])
    assert names == {"velocity_1_POD", "velocity_2_POD", "velocity_3_POD",
                     "velocity_magnitude_POD", "velocity_POD",
                     "k_POD", "epsilon_POD"}
    # scalar slots land in the right block (cell->point averaged corner
    # value equals the cell value mean at an interior node)
    mean_vtk = vtk_io.write_mean_field_vtk(
        str(tmp_path), packed, geom, varset=vs)
    dm = vtk_io.read_unstructured_grid(mean_vtk)
    np.testing.assert_array_equal(dm["cell_data"]["k_POD"],
                                  packed[3 * n_cells:4 * n_cells])


# --------------------------------------------------------------------------
# save_planes multi-var assembly
# --------------------------------------------------------------------------

def test_save_planes_multivar_packing(tmp_path, rng):
    """The postproc plane loop packs velocity + scalars into consecutive
    slots exactly like the reference (PODFS.py:706-734)."""
    from pods_digital_filter_tpu.postproc.planes import (
        PlaneSpec, extract_plane, save_planes)

    # a small volume with linear fields
    g = np.linspace(0.0, 1.0, 6)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    vel = np.stack([pts[:, 0], 2 * pts[:, 1], 3 * pts[:, 2]], axis=1)
    kf = pts[:, 0] + pts[:, 1]
    ef = 2.0 * pts[:, 2] + 0.5
    fields = {"velocity": vel, "k": kf, "epsilon": ef}

    res = 8
    nc = res * res
    spec = PlaneSpec("p0", normal=(1.0, 0.0, 0.0), save=False, pod=True)
    pod_matrix = {"p0": np.zeros((5 * nc, 2))}
    save_planes(pts, fields, [spec], 0.0, 0, str(tmp_path),
                pod_matrix=pod_matrix, resolution=res,
                pod_vars=["velocity", "k", "epsilon"])
    save_planes(pts, fields, [spec], 0.1, 1, str(tmp_path),
                pod_matrix=pod_matrix, resolution=res,
                pod_vars=["velocity", "k", "epsilon"])

    col = pod_matrix["p0"][:, 0]
    # check against a direct extraction
    plane = extract_plane(pts, fields, (1.0, 0.0, 0.0), resolution=res)
    uc = plane.cell_field("velocity")
    np.testing.assert_allclose(col[:nc], uc[:, 0], atol=1e-12)
    np.testing.assert_allclose(col[3 * nc:4 * nc], plane.cell_field("k"),
                               atol=1e-12)
    np.testing.assert_allclose(col[4 * nc:], plane.cell_field("epsilon"),
                               atol=1e-12)
    # snapshots identical fields -> identical columns
    np.testing.assert_allclose(pod_matrix["p0"][:, 1], col)


def test_save_planes_polar_rotation(tmp_path):
    """spec.polar rotates vectors to (axial, radial, tangential) per cell
    (make_planes_polar, PODFS.py:711-720): a purely radial field maps to
    slot 2, zero tangential."""
    from pods_digital_filter_tpu.postproc.planes import (
        PlaneSpec, save_planes)

    g = np.linspace(-1.0, 1.0, 7)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    # radial (in y-z) vector field about the x-axis through the origin
    vel = np.stack([np.zeros(pts.shape[0]), pts[:, 1], pts[:, 2]], axis=1)
    res = 6
    nc = res * res
    # r_limits keeps only cells inside the volume hull, where the linear
    # interpolation is exact (outside, nearest-neighbour fill breaks the
    # linear field)
    spec = PlaneSpec("p0", normal=(1.0, 0.0, 0.0), centre=(0.0, 0.0, 0.0),
                     save=False, pod=True, polar=True, r_limits=(0.0, 0.9))
    pod_matrix = {"p0": np.zeros((3 * nc, 1))}
    save_planes(pts, vel_fields := {"velocity": vel}, [spec], 0.0, 0,
                str(tmp_path), pod_matrix=pod_matrix, resolution=res,
                pod_vars=["velocity"])
    col = pod_matrix["p0"][:, 0]
    ur = col[nc:2 * nc]
    ut = col[2 * nc:]
    assert np.all(ur >= -1e-9)               # radial component = |r| >= 0
    np.testing.assert_allclose(ut, 0.0, atol=1e-9)
    assert ur.max() > 0.3
