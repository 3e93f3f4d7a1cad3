"""Inlet-plane geometry, VTK-free.

Reference: ``make_inflow_plane`` (PODFS.py:1243-1290) builds the plane mesh
through a vtkPlaneSource + four chained vtkTransforms:

1. unit plane with ``SetResolution(kma, jma)`` (kma cells along the first
   axis, jma along the second) and ``SetNormal(1, 0, 0)`` — which rotates the
   default (0,0,1)-normal plane about +y by 90 deg, mapping a parametric
   point ``(px, py, 0)`` to ``(0, py, -px)``;
2. ``Scale(0, s2, s3)`` with ``s2 = res*jma^2/(jma-1)``,
   ``s3 = res*kma^2/(kma-1)``;
3. ``RotateWXYZ(alpha, (0, -nz, ny))`` with ``alpha = acos(nx)`` — takes
   (1,0,0) to the requested normal;
4. ``RotateWXYZ(beta + rot, n)`` with ``beta = atan2(nz, ny)`` — twist about
   the normal;
5. ``Translate(origin)``.

VTK cell ordering is x-resolution-fastest, so cell ``c = j*kma + i`` — which
is exactly the reference's snapshot packing ``p = j*kma + k``
(digitalfilters.py:1471-1473); cell centres are at parametric centres
``px = -0.5 + (i+0.5)/kma``, ``py = -0.5 + (j+0.5)/jma``.

Everything below reproduces those transforms in closed form with numpy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pods_digital_filter_tpu.config import PlaneConfig
from pods_digital_filter_tpu.ops.rotation import rodrigues


@dataclass
class PlaneGeometry:
    """Replaces the reference's vtkPolyData ``grid`` on the main path."""

    config: PlaneConfig
    cell_centers: np.ndarray   # (jma*kma, 3), ordering p = j*kma + k
    node_points: np.ndarray    # ((jma+1)*(kma+1), 3)

    @property
    def num_cells(self) -> int:
        return self.config.num_points

    def cell_areas(self) -> np.ndarray:
        """Quad cell areas via the two-triangle Heron split
        (reference ``calc_cell_areas``, PODFS.py:891-946)."""
        jma, kma = self.config.jma, self.config.kma
        pts = self.node_points.reshape(jma + 1, kma + 1, 3)
        p00 = pts[:-1, :-1].reshape(-1, 3)
        p01 = pts[:-1, 1:].reshape(-1, 3)
        p11 = pts[1:, 1:].reshape(-1, 3)
        p10 = pts[1:, :-1].reshape(-1, 3)

        def heron(a, b, c):
            la = np.linalg.norm(a - b, axis=1)
            lb = np.linalg.norm(b - c, axis=1)
            lc = np.linalg.norm(c - a, axis=1)
            s = 0.5 * (la + lb + lc)
            return np.sqrt(np.maximum(s * (s - la) * (s - lb) * (s - lc), 0.0))

        return heron(p00, p01, p11) + heron(p00, p11, p10)


def _plane_transform(cfg: PlaneConfig) -> np.ndarray:
    nx, ny, nz = cfg.normal
    alpha = np.degrees(np.arccos(np.clip(nx, -1.0, 1.0)))
    beta = np.degrees(np.arctan2(nz, ny))
    R2 = rodrigues(np.array([0.0, -nz, ny]), np.radians(alpha))
    R3 = rodrigues(np.array([nx, ny, nz]), np.radians(beta + cfg.rot_deg))
    return R3 @ R2


def make_inflow_plane(cfg: PlaneConfig) -> PlaneGeometry:
    jma, kma = cfg.jma, cfg.kma
    s2 = cfg.res * float(jma) * float(jma) / (float(jma) - 1.0)
    s3 = cfg.res * float(kma) * float(kma) / (float(kma) - 1.0)

    # cell-centre parametric coordinates; ordering p = j*kma + i
    i = np.arange(kma)
    j = np.arange(jma)
    px = -0.5 + (i[None, :] + 0.5) / kma    # along the kma axis
    py = -0.5 + (j[:, None] + 0.5) / jma    # along the jma axis
    # after SetNormal(1,0,0): (px, py, 0) -> (0, py, -px); then Scale(0,s2,s3)
    cc = np.zeros((jma, kma, 3))
    cc[..., 1] = s2 * np.broadcast_to(py, (jma, kma))
    cc[..., 2] = -s3 * np.broadcast_to(px, (jma, kma))
    centers = cc.reshape(jma * kma, 3)

    # node points, same mapping at parametric nodes
    iN = np.arange(kma + 1)
    jN = np.arange(jma + 1)
    pxN = -0.5 + iN[None, :] / kma
    pyN = -0.5 + jN[:, None] / jma
    nn = np.zeros((jma + 1, kma + 1, 3))
    nn[..., 1] = s2 * np.broadcast_to(pyN, (jma + 1, kma + 1))
    nn[..., 2] = -s3 * np.broadcast_to(pxN, (jma + 1, kma + 1))
    nodes = nn.reshape(-1, 3)

    R = _plane_transform(cfg)
    origin = np.asarray(cfg.origin)
    centers = centers @ R.T + origin
    nodes = nodes @ R.T + origin
    return PlaneGeometry(config=cfg, cell_centers=centers, node_points=nodes)
