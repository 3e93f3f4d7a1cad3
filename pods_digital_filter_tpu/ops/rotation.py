"""Velocity-frame rotation onto the inlet-plane normal.

Reference: ``prof_rotation_matrix`` (digitalfilters.py:1064-1116) builds the
rotation taking ``[1,0,0]`` to the plane normal ``n`` as the product of an
azimuthal and a polar rotation; ``rotate_velocity`` (1119-1131) applies it to
every point of the packed ``[u; v; w]`` snapshot vector one at a time.

Here the per-point loop becomes a single (3,3) @ (3, Np) matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def profile_rotation_matrix(nx: float, ny: float, nz: float) -> np.ndarray:
    """Rotation matrix R with R @ [1,0,0] == n, split azimuthal * polar
    (exact reference semantics incl. its sign conventions)."""
    n = np.sqrt(nx ** 2 + ny ** 2 + nz ** 2)
    n_proj = np.sqrt(nx ** 2 + ny ** 2)

    if ny > 0:
        azimuth = np.arccos(nx / n_proj)
    elif ny < 0:
        azimuth = -np.arccos(nx / n_proj)
    elif ny == 0 and nx >= 0:
        azimuth = 0.0
    else:  # ny == 0 and nx < 0
        azimuth = np.pi

    c, s = np.cos(azimuth), np.sin(azimuth)
    Ra = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])

    if nz > 0:
        polar = np.arccos(n_proj / n)
    elif nz < 0:
        polar = -np.arccos(n_proj / n)
    else:
        polar = 0.0

    c, s = np.cos(polar), np.sin(polar)
    Rp = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
    return Ra.dot(Rp)


def rotate_velocity_packed(A, nx: float, ny: float, nz: float):
    """Rotate a packed ``[u(Np); v(Np); w(Np)]`` vector (or a batch of them,
    trailing axis = snapshots) into the plane frame: one small matmul instead
    of the reference's per-point loop."""
    R = jnp.asarray(profile_rotation_matrix(nx, ny, nz), dtype=A.dtype)
    pts = A.shape[0] // 3
    V = A.reshape((3, pts) + A.shape[1:])
    Vr = jnp.tensordot(R, V, axes=([1], [0]))
    return Vr.reshape(A.shape)


def rotate_velocity_fields(uvw, nx: float, ny: float, nz: float):
    """Rotate stacked component fields ``(3, ...)`` into the plane frame."""
    R = jnp.asarray(profile_rotation_matrix(nx, ny, nz), dtype=uvw.dtype)
    return jnp.tensordot(R, uvw, axes=([1], [0]))


def rodrigues(axis: np.ndarray, angle_rad: float) -> np.ndarray:
    """Rotation matrix about an arbitrary (not necessarily unit) axis —
    used by the plane-geometry builder (mirrors vtkTransform::RotateWXYZ)."""
    axis = np.asarray(axis, dtype=np.float64)
    nrm = np.linalg.norm(axis)
    if nrm == 0.0:
        return np.eye(3)
    x, y, z = axis / nrm
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    t = 1.0 - c
    return np.array([
        [t * x * x + c,     t * x * y - s * z, t * x * z + s * y],
        [t * x * y + s * z, t * y * y + c,     t * y * z - s * x],
        [t * x * z - s * y, t * y * z + s * x, t * z * z + c],
    ])
