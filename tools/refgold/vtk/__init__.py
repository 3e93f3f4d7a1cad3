"""Minimal pure-numpy emulation of the VTK objects touched by the
reference's default main path (make_inflow_plane, write_mean_field2,
pod2prf — PODFS.py:438-498, 1243-1290, 1662-1800), so the *actual
reference code* can execute in this environment (which has no VTK build)
to produce golden fixtures.

This is NOT a VTK reimplementation: each class implements only the handful
of methods the reference calls, with semantics written from VTK's published
documentation/source behavior:

* ``vtkPlaneSource`` — unit plane centered at the origin with
  ``(XRes+1) x (YRes+1)`` float32 points and quad cells; ``SetNormal``
  rotates the three defining points about the plane center;
* ``vtkTransform`` — a 4x4 matrix with Scale / RotateWXYZ(deg) / Translate;
* ``vtkTransformPolyDataFilter`` — applies the matrix to the points;
* ``vtkCellCenters`` — mean of each cell's corner points;
* ``vtkUnstructuredGrid(Writer)`` — data-array containers; the binary
  writer emits a placeholder (VTK binary outputs are not golden-captured).
"""

from __future__ import annotations

import numpy as np


def _rodrigues(axis, theta):
    k = np.asarray(axis, dtype=np.float64)
    k = k / np.linalg.norm(k)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1.0 - np.cos(theta)) * (K @ K)


class _VtkDataArray:
    """Named array holder (what numpy_to_vtk returns)."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)
        self._name = ""

    def SetName(self, name):
        self._name = name

    def GetName(self):
        return self._name


class _Points:
    def __init__(self, arr):
        self._arr = np.asarray(arr, dtype=np.float32)

    def GetData(self):
        return self._arr

    def GetNumberOfPoints(self):
        return self._arr.shape[0]

    def GetPoint(self, i):
        return tuple(float(v) for v in self._arr[i])


class _FieldData:
    def __init__(self):
        self._arrays = []

    def Initialize(self):
        self._arrays = []

    def AddArray(self, a):
        self._arrays.append(a)

    def GetArray(self, name):
        for a in self._arrays:
            if getattr(a, "_name", None) == name:
                return a
        return None


class vtkPolyData:
    def __init__(self, points=None, cells=None):
        self._points = points
        self._cells = cells          # list of point-index tuples
        self._pointdata = _FieldData()
        self._celldata = _FieldData()

    def GetPoints(self):
        return self._points

    def GetNumberOfPoints(self):
        return 0 if self._points is None else self._points.GetNumberOfPoints()

    def GetNumberOfCells(self):
        return 0 if self._cells is None else len(self._cells)

    def GetPointData(self):
        return self._pointdata

    def GetCellData(self):
        return self._celldata

    def DeepCopy(self, other):
        if other._points is not None:
            self._points = _Points(other._points.GetData().copy())
        self._cells = None if other._cells is None else list(other._cells)
        self._pointdata = _FieldData()
        self._pointdata._arrays = list(other._pointdata._arrays)
        self._celldata = _FieldData()
        self._celldata._arrays = list(other._celldata._arrays)


class vtkUnstructuredGrid(vtkPolyData):
    pass


class vtkPlaneSource:
    """Defaults per VTK: Origin (-0.5,-0.5,0), Point1 (0.5,-0.5,0),
    Point2 (-0.5,0.5,0), normal +z, resolution 1x1; float32 output
    points."""

    def __init__(self):
        self._origin = np.array([-0.5, -0.5, 0.0])
        self._p1 = np.array([0.5, -0.5, 0.0])
        self._p2 = np.array([-0.5, 0.5, 0.0])
        self._xres = 1
        self._yres = 1

    def SetResolution(self, xres, yres):
        self._xres, self._yres = int(xres), int(yres)

    def _center(self):
        return (self._origin
                + 0.5 * (self._p1 - self._origin)
                + 0.5 * (self._p2 - self._origin))

    def _normal(self):
        n = np.cross(self._p1 - self._origin, self._p2 - self._origin)
        return n / np.linalg.norm(n)

    def SetNormal(self, nx, ny, nz):
        n1 = np.array([nx, ny, nz], dtype=np.float64)
        n1 = n1 / np.linalg.norm(n1)
        n0 = self._normal()
        dp = float(np.clip(np.dot(n0, n1), -1.0, 1.0))
        if dp >= 1.0 - 1e-15:
            return
        axis = np.cross(n0, n1)
        if np.linalg.norm(axis) < 1e-15:
            # antiparallel: rotate 180 deg about any vector perpendicular
            # to the current normal
            axis = np.cross(n0, [1.0, 0.0, 0.0])
            if np.linalg.norm(axis) < 1e-12:
                axis = np.cross(n0, [0.0, 1.0, 0.0])
        R = _rodrigues(axis, np.arccos(dp))
        c = self._center()
        self._origin = c + R @ (self._origin - c)
        self._p1 = c + R @ (self._p1 - c)
        self._p2 = c + R @ (self._p2 - c)

    def GetOutputPort(self):
        return self

    def Update(self):
        pass

    def GetOutput(self):
        xr, yr = self._xres, self._yres
        v1 = self._p1 - self._origin
        v2 = self._p2 - self._origin
        ii = np.arange(xr + 1, dtype=np.float64) / xr
        jj = np.arange(yr + 1, dtype=np.float64) / yr
        pts = (self._origin[None, None, :]
               + ii[None, :, None] * v1[None, None, :]
               + jj[:, None, None] * v2[None, None, :])     # (yr+1, xr+1, 3)
        pts = pts.reshape(-1, 3)                             # i fastest
        cells = []
        for j in range(yr):
            for i in range(xr):
                base = i + j * (xr + 1)
                cells.append((base, base + 1, base + xr + 2, base + xr + 1))
        return vtkPolyData(_Points(pts), cells)


class vtkTransform:
    def __init__(self):
        self._m = np.eye(4)

    def Scale(self, sx, sy, sz):
        self._m = self._m @ np.diag([sx, sy, sz, 1.0])

    def Translate(self, tx, ty, tz):
        t = np.eye(4)
        t[:3, 3] = [tx, ty, tz]
        self._m = self._m @ t

    def RotateWXYZ(self, deg, x, y, z):
        axis = np.array([x, y, z], dtype=np.float64)
        if np.linalg.norm(axis) < 1e-300 or deg == 0.0:
            return
        r = np.eye(4)
        r[:3, :3] = _rodrigues(axis, np.deg2rad(deg))
        self._m = self._m @ r

    def apply(self, pts):
        p = np.asarray(pts, dtype=np.float64)
        return p @ self._m[:3, :3].T + self._m[:3, 3]


class vtkTransformPolyDataFilter:
    def __init__(self):
        self._input = None
        self._transform = None
        self._output = None

    def SetInputConnection(self, port):
        self._input = port

    def SetInputData(self, pd):
        self._input = pd

    def SetTransform(self, t):
        self._transform = t

    def GetOutputPort(self):
        return self

    def Update(self):
        src = self._input
        pd = src.GetOutput() if hasattr(src, "GetOutput") else src
        if hasattr(pd, "Update"):
            pd.Update()
        pts = self._transform.apply(pd.GetPoints().GetData())
        self._output = vtkPolyData(_Points(pts), pd._cells)

    def GetOutput(self):
        if self._output is None:
            self.Update()
        return self._output


class vtkCellCenters:
    def __init__(self):
        self._input = None
        self._output = None

    def SetInputData(self, pd):
        self._input = pd

    def VertexCellsOn(self):
        pass

    def Update(self):
        pd = self._input
        pts = np.asarray(pd.GetPoints().GetData(), dtype=np.float64)
        centers = np.stack([pts[list(c)].mean(axis=0) for c in pd._cells])
        self._output = vtkPolyData(_Points(centers), None)

    def GetOutput(self):
        if self._output is None:
            self.Update()
        return self._output


class vtkUnstructuredGridWriter:
    """Placeholder: the binary legacy-VTK outputs are not golden-captured
    (this framework's own raw-byte VTK writer is format-tested elsewhere)."""

    def __init__(self):
        self._filename = None

    def SetFileTypeToBinary(self):
        pass

    def SetInputData(self, grid):
        pass

    def SetFileName(self, name):
        self._filename = name

    def Write(self):
        with open(self._filename, "w") as f:
            f.write("# placeholder (vtk stub): binary VTK not captured\n")
